"""BASELINE config 3: DLRM with row-sharded tables + all-to-all over a mesh.

On a real multi-chip host the mesh covers all local devices; this script
also runs on the 8-device virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu).
For multi-host pods, initialize via deeprec_tpu.parallel.multihost.
"""

import jax
import numpy as np
import optax
from jax.sharding import Mesh

try:
    from examples.common import make_data
except ImportError:  # run as a script
    from common import make_data
from deeprec_tpu.models import get_model
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.parallel.trainer import DistributedTrainer


def main(steps=200, batch_size=2048):
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    trainer = DistributedTrainer(
        model=get_model("dlrm"), mesh=mesh,
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05),
        per_shard_capacity=2 ** 19,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    it = make_data(batch_size)
    for i in range(steps):
        state, m = trainer.train_step(state, next(it))
        loss = m["loss"]
        if (i + 1) % 50 == 0:
            state = trainer.maybe_grow(state)
            print(f"step {i+1}: loss={float(loss):.4f}")


if __name__ == "__main__":
    main()
