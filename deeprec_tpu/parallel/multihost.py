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

    env_np = os.environ.get("JAX_NUM_PROCESSES")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if num_processes is not None and num_processes > 1 \
            or coordinator_address is not None:
        # Explicit configuration.  process_id stays None unless given —
        # jax.distributed resolves it from its cluster environment; a
        # blanket default of 0 would make EVERY process claim id 0.
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("JAX_COORDINATOR_ADDRESS"),
            num_processes=num_processes,
            process_id=process_id if process_id is not None
            else (int(os.environ["JAX_PROCESS_ID"])
                  if "JAX_PROCESS_ID" in os.environ else None),
        )
    elif num_processes is None:
        # Nothing explicit: let jax.distributed AUTO-DETECT (TPU-pod
        # metadata, GKE, Slurm cluster plugins).  The round-4 review
        # caught the old behavior — skipping initialize entirely — which
        # on a pod slice silently built a local-devices-only mesh and let
        # every host train an independent replica.  Where no cluster
        # environment exists, auto-detection raises and single-process
        # operation proceeds.
        try:
            jax.distributed.initialize()
        except Exception as e:  # no cluster environment: single process
            # Loud fallback: on a real pod slice a TRANSIENT coordinator /
            # metadata failure lands here too, and silently training
            # independent per-host replicas is the exact failure mode the
            # auto-detect path exists to prevent (round-5 advice).
            import logging

            logging.getLogger(__name__).warning(
                "jax.distributed.initialize() auto-detection failed (%s: %s)"
                " — proceeding SINGLE-PROCESS. If this job is meant to span"
                " multiple hosts, pass coordinator_address/num_processes/"
                "process_id explicitly.", type(e).__name__, e)
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
