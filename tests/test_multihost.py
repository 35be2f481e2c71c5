"""Two-process multihost training + cluster WorkQueue (VERDICT r1 item 7).

Spawns 2 real OS processes, each owning 2 virtual CPU devices; they form one
jax.distributed cluster (Gloo transport), train a DistributedTrainer over
the combined 4-device mesh, and share a WorkQueueServer hosted on process 0
— the in-process analog the reference tests with multi-task in-process
servers (SURVEY.md §4), but across actual process boundaries.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_and_work_queue(tmp_path):
    coord, wq = _free_port(), _free_port()
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(i), "2", str(coord), str(wq), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"proc {i} failed:\n{logs[i][-3000:]}"

    r0 = json.load(open(outs[0]))
    r1 = json.load(open(outs[1]))
    # both saw the combined 4-device cluster
    assert r0["n_devices"] == 4 and r1["n_devices"] == 4
    # SPMD: the replicated loss is identical on both processes, and training
    # made progress
    assert r0["losses"] == pytest.approx(r1["losses"], rel=1e-5)
    assert r0["losses"][-1] < r0["losses"][0]
    # the cluster queue handed each item to exactly one process
    assert not (set(r0["taken"]) & set(r1["taken"]))
    assert len(r0["taken"]) + len(r1["taken"]) == 4
    # queue checkpoint state restores (4 of 8 items consumed at save time)
    assert r0["restored_size"] == 4


def _run_cluster(nprocs, phase, ckpt_dir, tmp_path, tag):
    coord = _free_port()
    outs = [str(tmp_path / f"{tag}_out{i}.json") for i in range(nprocs)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(i), str(nprocs), str(coord), "0", outs[i], phase,
             str(ckpt_dir)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nprocs)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"{tag} proc {i} failed:\n{logs[i][-3000:]}"
    return [json.load(open(o)) for o in outs]


def test_multiprocess_checkpoint_save_kill_restore(tmp_path):
    """VERDICT r2 item 3: per-process export of addressable shards, restore
    across a *different* process count, save -> kill -> restore -> continue.

    Three clusters over the same logical 4-device mesh:
      (a) 2 processes train 6 steps and checkpoint (each process writes only
          its own shards — the multi-process mshard path);
      (b) a fresh 2-process cluster restores and trains 4 more steps;
      (c) a single process (4 local devices) restores the SAME checkpoint
          and trains the same 4 steps.
    (b) and (c) must agree: step continuity, table sizes, and the loss
    trajectory of the continuation — the reference's reshard-on-restore
    semantics (embedding_var_restore.cc:337-339) across process layouts.
    """
    ckpt = tmp_path / "ckpt"
    save = _run_cluster(2, "save", ckpt, tmp_path, "save")
    assert save[0]["sizes"] == save[1]["sizes"]
    assert all(s > 0 for s in save[0]["sizes"].values())
    # the save cluster is dead (processes exited) — restore into new ones
    r2 = _run_cluster(2, "resume", ckpt, tmp_path, "r2")
    r1 = _run_cluster(1, "resume", ckpt, tmp_path, "r1")
    for r in (r2[0], r2[1], r1[0]):
        assert r["restored_step"] == 6
        assert r["final_step"] == 10
        # every live row survived the round trip
        assert r["sizes"] == save[0]["sizes"]
    # SPMD: both processes of the resume cluster agree exactly
    assert r2[0]["losses"] == pytest.approx(r2[1]["losses"], rel=1e-6)
    # and the 1-process layout reproduces the 2-process continuation
    assert r1[0]["losses"] == pytest.approx(r2[0]["losses"], rel=1e-4)


def test_multiprocess_tiered_checkpoint(tmp_path):
    """TODO r3 correctness #5: multi-process + tiered storage.  64-row hot
    shards force demotion during a 2-process run; each process dumps its
    LOCAL cold shards as a pshard file; fresh clusters (2-proc and 1-proc)
    restore the merged cold set, promote rows back through the collective
    promotion path, and must produce identical continuations."""

    ckpt = tmp_path / "ckpt"
    save = _run_cluster(2, "tiered_save", ckpt, tmp_path, "tsave")
    # demotion actually happened, into BOTH processes' local cold stores
    # (routing spreads uniformly; with 4 tables x hundreds of demoted rows
    # a one-sided split is impossible)
    tot_saved = {n: save[0]["cold_local"][n] + save[1]["cold_local"][n]
                 for n in save[0]["cold_local"]}
    assert any(v > 0 for v in tot_saved.values())
    assert any(v > 0 for v in save[0]["cold_local"].values())
    assert any(v > 0 for v in save[1]["cold_local"].values())

    r2 = _run_cluster(2, "tiered_resume", ckpt, tmp_path, "tr2")
    r1 = _run_cluster(1, "tiered_resume", ckpt, tmp_path, "tr1")
    # every cold row survived, re-routed onto each layout's local shards
    tot_r2 = {n: r2[0]["cold_local"][n] + r2[1]["cold_local"][n]
              for n in tot_saved}
    assert tot_r2 == tot_saved
    assert {n: r1[0]["cold_local"][n] for n in tot_saved} == tot_saved
    for r in (r2[0], r2[1], r1[0]):
        assert r["restored_step"] == 6 and r["final_step"] == 10
    # the 2-process collective promote path reproduces the single-process
    # continuation (same SPMD math, different cold-store ownership)
    assert r2[0]["losses"] == pytest.approx(r2[1]["losses"], rel=1e-6)
    assert r1[0]["losses"] == pytest.approx(r2[0]["losses"], rel=1e-4)


def test_multiprocess_crash_mid_mshard_save_keeps_previous(tmp_path):
    """Round-5 verdict #7: a kill MID-mshard-save (some shard files on a
    shared filesystem, no barrier, no pointer flip) must leave the previous
    checkpoint as the restore target; a fresh cluster resumes from it."""

    ckpt = tmp_path / "ckpt"
    res = _run_cluster(2, "save_crash", ckpt, tmp_path, "sc")
    assert all(r["crashed"] for r in res)
    assert all(r["step_at_crash"] == 8 for r in res)
    # the partial step_8 dir exists on disk but was never committed
    assert os.path.isdir(str(ckpt / "step_8"))
    assert not os.path.exists(str(ckpt / "step_8" / "meta.json"))

    r2 = _run_cluster(2, "resume", ckpt, tmp_path, "r2")
    r1 = _run_cluster(1, "resume", ckpt, tmp_path, "r1")
    for r in (r2[0], r2[1], r1[0]):
        assert r["restored_step"] == 6  # the committed save, not the torn 8
        assert r["final_step"] == 10
    assert r2[0]["losses"] == pytest.approx(r2[1]["losses"], rel=1e-6)
    assert r1[0]["losses"] == pytest.approx(r2[0]["losses"], rel=1e-4)
