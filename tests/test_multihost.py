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
