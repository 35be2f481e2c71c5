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
# 4 global devices regardless of process count (2x2 or 1x4) so checkpoints
# restore across different process layouts of the SAME logical mesh.
_NPROCS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={4 // _NPROCS}")


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    coord_port = int(sys.argv[3])
    wq_port = int(sys.argv[4])
    out_path = sys.argv[5]
    phase = sys.argv[6] if len(sys.argv) > 6 else "wq_train"
    ckpt_dir = sys.argv[7] if len(sys.argv) > 7 else None

    import jax

    jax.config.update("jax_platforms", "cpu")
    if phase != "wq_train":
        return ckpt_phase(pid, nprocs, coord_port, out_path, phase, ckpt_dir)

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
    # Barrier before the snapshot: without it process 0 can capture queue
    # state while process 1's takes are still in flight (the round-2 flake —
    # restored_size 6 != 4).  The snapshot must observe all 4 takes.
    multihost.barrier("wq_takes_done")
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


def _build_trainer(mesh, tiered: bool = False):
    import jax.numpy as jnp
    import optax

    from deeprec_tpu.models import base, nn
    from deeprec_tpu.optimizers import sparse
    from deeprec_tpu.parallel.trainer import DistributedTrainer

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
    return DistributedTrainer(
        model=model, mesh=mesh,
        sparse_optimizer=sparse.adagrad(lr=0.05),
        dense_tx=optax.adagrad(0.05),
        per_shard_capacity=64 if tiered else 2 ** 10,
    )


def _attach_tiers(tr, state, mesh):
    from deeprec_tpu.parallel.tiers import ShardedTiers

    tr.tiers = {n: ShardedTiers(t, mesh, "data",
                                hot_watermark=0.5, evict_fraction=0.5)
                for n, t in state.tables.items()}
    return tr


def _run_steps(tr, mesh, state, pid, nprocs, *, seed, steps, grow=False):
    """Deterministic global batch stream (identical regardless of process
    layout); each process feeds its contiguous slice."""
    import jax
    import numpy as np

    from deeprec_tpu.data.synthetic import SyntheticCriteo
    from deeprec_tpu.parallel import multihost

    gen = SyntheticCriteo(batch_size=256, num_ids_per_col=2000, seed=seed)
    it = iter(gen)
    losses = []
    for _ in range(steps):
        full = next(it)
        lo = pid * (256 // nprocs)
        hi = lo + 256 // nprocs
        local = jax.tree.map(lambda v: np.asarray(v)[lo:hi], full)
        gbatch = multihost.global_batch(mesh, local)
        state, m = tr.train_step(state, gbatch)
        if grow:
            state = tr.maybe_grow(state)
        losses.append(float(m["loss"]))
    return state, losses


def ckpt_phase(pid, nprocs, coord_port, out_path, phase, ckpt_dir):
    """Multi-process checkpoint lifecycle (VERDICT r2 item 3):

    phase "save":   train 6 steps on the cluster, save_checkpoint (each
                    process writes its addressable shards as mshard files —
                    the reference's per-task sharded bundles,
                    python/training/saver.py:905), record state.
    phase "resume": fresh cluster (possibly a DIFFERENT process count over
                    the same 4-device mesh), restore_checkpoint, verify step
                    continuity, train 4 more steps — losses must match any
                    other process layout bit-for-bit-ish (same SPMD math).
    """
    import jax
    import jax.numpy as jnp

    from deeprec_tpu.parallel import multihost
    from deeprec_tpu.train import saver

    mesh = multihost.initialize(
        coordinator_address=f"localhost:{coord_port}" if nprocs > 1 else None,
        num_processes=nprocs, process_id=pid)
    assert len(jax.devices()) == 4
    tiered = phase.startswith("tiered_")
    tr = _build_trainer(mesh, tiered=tiered)
    state = tr.init_state(jax.random.PRNGKey(0))
    if tiered:
        tr = _attach_tiers(tr, state, mesh)
    result = {"pid": pid, "n_devices": len(jax.devices())}

    if phase == "save":
        state, losses = _run_steps(tr, mesh, state, pid, nprocs,
                                   seed=1, steps=6)
        d = saver.save_checkpoint(ckpt_dir, state)
        result["losses"] = losses
        result["ckpt"] = d
        result["sizes"] = {n: int(jnp.sum(t.size))
                           for n, t in state.tables.items()}
    elif phase == "save_crash":
        # round-5 verdict #7: kill MID-mshard-save.  A good step-6
        # checkpoint commits; training continues to step 8; the step-8
        # save dies after ONE mshard file per process — before the
        # cluster barrier, so the commit pointer is never flipped and
        # the partial step_8 dir is unreachable garbage.
        state, losses = _run_steps(tr, mesh, state, pid, nprocs,
                                   seed=1, steps=6)
        saver.save_checkpoint(ckpt_dir, state)
        state, _ = _run_steps(tr, mesh, state, pid, nprocs,
                              seed=7, steps=2)
        real = saver._save_table_mshard
        calls = {"n": 0}

        def dying(*a, **kw):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("simulated kill mid-mshard save")
            return real(*a, **kw)

        saver._save_table_mshard = dying
        try:
            saver.save_checkpoint(ckpt_dir, state)
            result["crashed"] = False
        except RuntimeError:
            result["crashed"] = True
        finally:
            saver._save_table_mshard = real
        result["step_at_crash"] = int(state.step)
    elif phase == "resume":
        path = saver.latest_checkpoint(ckpt_dir)
        state = saver.restore_checkpoint(path, state)
        result["restored_step"] = int(state.step)
        result["sizes"] = {n: int(jnp.sum(t.size))
                           for n, t in state.tables.items()}
        state, losses = _run_steps(tr, mesh, state, pid, nprocs,
                                   seed=101, steps=4)
        result["losses"] = losses
        result["final_step"] = int(state.step)
    elif phase == "tiered_save":
        # TODO r3 correctness #5: tier-complete multi-controller save —
        # tight 64-row hot shards force demotion into each process's LOCAL
        # cold stores; each process dumps its own cold pshard.
        state, losses = _run_steps(tr, mesh, state, pid, nprocs,
                                   seed=1, steps=6, grow=True)
        d = saver.save_checkpoint(ckpt_dir, state, tiers=tr.tiers)
        result["losses"] = losses
        result["ckpt"] = d
        result["cold_local"] = {n: int(t.cold_size)
                                for n, t in tr.tiers.items()}
        result["sizes"] = {n: int(jnp.sum(t.size))
                           for n, t in state.tables.items()}
    elif phase == "tiered_resume":
        path = saver.latest_checkpoint(ckpt_dir)
        state = saver.restore_checkpoint(path, state, tiers=tr.tiers)
        result["restored_step"] = int(state.step)
        result["cold_local"] = {n: int(t.cold_size)
                                for n, t in tr.tiers.items()}
        # continue training: promotion pulls restored cold rows back through
        # the collective promote path (allgathered pad, local KV lookups)
        state, losses = _run_steps(tr, mesh, state, pid, nprocs,
                                   seed=101, steps=4, grow=True)
        result["losses"] = losses
        result["final_step"] = int(state.step)
    else:
        raise ValueError(phase)

    with open(out_path, "w") as f:
        json.dump(result, f)
    print("WORKER_OK", pid, flush=True)


if __name__ == "__main__":
    main()
