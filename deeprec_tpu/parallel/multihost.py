"""Multi-host (multi-controller) initialization over DCN.

The reference scales across hosts with TF_CONFIG-driven PS/worker servers
(generate_cluster_info, modelzoo train.py:891); the TPU-native equivalent is
jax.distributed: every host runs the same SPMD program, the global Mesh spans
all hosts' devices, ICI carries in-slice collectives and DCN carries
cross-slice ones — no PS processes exist.

Usage (one call per process, before any jax op):

    from deeprec_tpu.parallel import multihost
    mesh = multihost.initialize()       # env-driven (TPU pods auto-detect)
    trainer = DistributedTrainer(model=..., mesh=mesh, ...)

Each process feeds its local batch shard; jax.make_array_from_process_local_
data assembles the global batch (helper below).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               axis_name: str = "data"):
    """jax.distributed.initialize + a 1-D global mesh over all devices.

    On Cloud TPU pods the three arguments auto-detect from the metadata
    server; elsewhere pass them explicitly (or set JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID).
    """

    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes > 1 or coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("JAX_COORDINATOR_ADDRESS"),
            num_processes=num_processes,
            process_id=process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis_name,))


def barrier(name: str) -> None:
    """Block until every process in the cluster reaches this point.

    The reference synchronizes cross-task state transitions with session
    barriers / chief coordination (monitored_session.py); here the
    coordination-service barrier does the same for multi-controller JAX —
    used e.g. before snapshotting a cluster WorkQueue so all in-flight
    takes have landed, and around multi-process checkpoint save/restore.
    """

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def global_batch(mesh, local_batch, axis_name: str = "data"):
    """Assemble a global sharded batch from per-process local shards."""

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch)
