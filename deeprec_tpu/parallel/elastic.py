"""Elastic scaling: change the shard count of a running job.

The reference's elastic-training service (ElasticGrpcServer::Update,
elastic_grpc_server_lib.h:34-54, elastic_training.proto:26-60) lets an
external controller grow/shrink the PS set; EVs re-shard cheaply thanks to
the 1000-partition checkpoint layout.  The TPU-native equivalent: the mesh
is the resource; re-scaling = checkpoint → rebuild the trainer on the new
mesh → restore (reshard-on-restore does the re-partitioning).  This module
wraps that into the reference's IsReadyScaling/ReadyToUpdate/UpdateServerDef
protocol shape so an external controller can drive it.
"""

from __future__ import annotations

import dataclasses
import os
import tempfile
from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh

from deeprec_tpu.train import saver


@dataclasses.dataclass
class ElasticController:
    """Host-side re-scaling coordinator for a DistributedTrainer job.

    ``via_disk=False`` (default) re-partitions device-to-device through host
    RAM (saver.reshard_state) — seconds, not minutes, for big tables.
    ``via_disk=True`` additionally cuts a full checkpoint and restores from
    it, making the rescale double as a recovery point.
    """

    make_trainer: Callable[[Mesh], object]   # mesh -> DistributedTrainer
    ckpt_dir: Optional[str] = None
    via_disk: bool = False

    def __post_init__(self):
        self.ckpt_dir = self.ckpt_dir or tempfile.mkdtemp(prefix="elastic_")
        self._pending: Optional[int] = None

    # -- the reference's 3-phase protocol ----------------------------------

    def is_ready_scaling(self, trainer, state) -> bool:
        """SCALING_READY when a consistent checkpoint can be cut."""

        return state is not None

    def ready_to_update(self, num_devices: int) -> None:
        """Stage a new cluster size (UpdateServerDefRequest)."""

        if num_devices > len(jax.devices()):
            raise ValueError(
                f"requested {num_devices} devices, have {len(jax.devices())}")
        self._pending = num_devices

    def update(self, trainer, state):
        """Apply the staged re-scale: ckpt → new mesh → restore.

        Returns (new_trainer, new_state).  The sharded tables re-partition
        via the saved sub-partitions (p % S == s), exactly the reference's
        re-shard path (embedding_var_restore.cc:337-339).
        """

        if self._pending is None:
            return trainer, state
        n = self._pending
        self._pending = None
        new_mesh = Mesh(np.asarray(jax.devices()[:n]), ("data",))
        new_trainer = self.make_trainer(new_mesh)
        template = new_trainer.init_state(jax.random.PRNGKey(0))
        if self.via_disk:
            path = saver.save_checkpoint(self.ckpt_dir, state)
            new_state = saver.restore_checkpoint(path, template)
        else:
            new_state = saver.reshard_state(state, template)
        if hasattr(new_trainer, "state_sharding"):
            new_state = jax.device_put(
                new_state, new_trainer.state_sharding(new_state))
        return new_trainer, new_state
