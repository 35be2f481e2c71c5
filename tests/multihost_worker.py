"""Worker program for the 2-process multihost test (launched by
test_multihost.py, one subprocess per simulated host).

Exercises the real multi-controller path the reference runs as TF_CONFIG
PS/worker clusters (generate_cluster_info, modelzoo train.py:891): each
process owns 2 virtual CPU devices, jax.distributed + Gloo carry the
cross-process collectives, the DistributedTrainer spans the combined
4-device mesh, and a WorkQueueServer on process 0 dispatches work items to
every process (work_queue_ops.cc:70 cluster-resource semantics).
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    coord_port = int(sys.argv[3])
    wq_port = int(sys.argv[4])
    out_path = sys.argv[5]

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import optax

    from deeprec_tpu.data.synthetic import SyntheticCriteo
    from deeprec_tpu.data.work_queue import (RemoteWorkQueue, WorkQueue,
                                             WorkQueueServer)
    from deeprec_tpu.models import base, nn
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.parallel import multihost
    from deeprec_tpu.parallel.trainer import DistributedTrainer

    mesh = multihost.initialize(
        coordinator_address=f"localhost:{coord_port}",
        num_processes=nprocs, process_id=pid)
    assert len(jax.devices()) == 2 * nprocs

    # -- cluster work queue: served by process 0, consumed by everyone -----
    server = None
    if pid == 0:
        server = WorkQueueServer(
            WorkQueue([f"file_{i}" for i in range(8)]),
            port=wq_port)
    import time

    deadline = time.time() + 20
    while True:
        try:
            wq = RemoteWorkQueue(("127.0.0.1", wq_port))
            break
        except OSError:
            if time.time() > deadline:
                raise
            time.sleep(0.2)
    taken = []
    for _ in range(2):
        item = wq.take()
        if item is not None:
            taken.append(item)
    saved_state = wq.state()

    # -- distributed training over the combined mesh -----------------------
    import jax.numpy as jnp

    cols = base.CATEGORICAL_COLUMNS[:4]
    specs = {c: base.TableSpec(name=c, dim=8, initial_capacity=2 ** 12)
             for c in cols}

    def init_params(key):
        return {"mlp": nn.mlp_init(key, 13 + 8 * len(cols), [64, 1])}

    def forward(params, batch, acts, train=True):
        x = jnp.concatenate(
            [batch["dense"]] + [acts[c] for c in cols], axis=1)
        return nn.mlp_apply(params["mlp"], x)[:, 0]

    model = base.RecModel(name="tiny", table_specs=specs,
                          init_params=init_params, forward=forward)
    tr = DistributedTrainer(
        model=model, mesh=mesh,
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05),
        per_shard_capacity=2 ** 10,
    )
    state = tr.init_state(jax.random.PRNGKey(0))

    # every process generates the SAME global batch stream, feeds its slice
    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=2000, seed=1)
    it = iter(gen)
    losses = []
    for _ in range(10):
        full = next(it)
        lo = pid * (256 // nprocs)
        hi = lo + 256 // nprocs
        local = jax.tree.map(lambda v: np.asarray(v)[lo:hi], full)
        gbatch = multihost.global_batch(mesh, local)
        state, m = tr.train_step(state, gbatch)
        losses.append(float(m["loss"]))

    result = {"pid": pid, "losses": losses, "taken": taken,
              "wq_state": saved_state,
              "n_devices": len(jax.devices())}
    with open(out_path, "w") as f:
        json.dump(result, f)
    wq.close()
    if server is not None:
        # process 0 drains and checks restore round-trip server-side
        server.queue.restore(saved_state)
        result["restored_size"] = server.queue.size()
        with open(out_path, "w") as f:
            json.dump(result, f)
        server.close()
    print("WORKER_OK", pid, flush=True)


if __name__ == "__main__":
    main()
