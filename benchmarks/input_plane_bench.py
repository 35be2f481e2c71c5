"""Input-plane loopback benchmark (VERDICT r1 weak item 4).

Measures the HOST pipeline at full rate, without training in the loop:
  stage A: TSV bytes -> native parse -> batch assembly (CriteoTSV)
  stage B: stage A + device_put (loopback onto the local CPU device)
  stage C: stage A + device_put to the real TPU (tunnel-bound here; the
           number that matters on a co-located TPU-VM is stage B's shape)

A multi-GB TSV is generated on the fly by tiling a 200k-row chunk (parse
cost is content-independent at this granularity).

Run: `JAX_PLATFORMS=cpu python benchmarks/input_plane_bench.py` (A+B)
     `python benchmarks/input_plane_bench.py --tpu` (adds C, backgrounded)
"""

import os
import sys
import time

if "--tpu" not in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

ROWS_CHUNK = 200_000
TILE = 20                      # ~ ROWS_CHUNK*TILE rows total
BATCH = 2048
TSV = "/tmp/input_bench.tsv"


def gen_tsv():
    rng = np.random.RandomState(0)
    lab = rng.randint(0, 2, ROWS_CHUNK)
    dense = rng.randint(0, 1000, (ROWS_CHUNK, 13))
    cats = rng.randint(0, 2 ** 32, (ROWS_CHUNK, 26), dtype=np.uint64)
    lines = []
    for i in range(ROWS_CHUNK):
        f = [str(lab[i])] + [str(x) for x in dense[i]] + \
            [format(int(x), "08x") for x in cats[i]]
        lines.append("\t".join(f))
    blob = ("\n".join(lines) + "\n").encode()
    with open(TSV, "wb") as f:
        for _ in range(TILE):
            f.write(blob)
    return ROWS_CHUNK * TILE, os.path.getsize(TSV)


def run(stage, n_rows):
    import jax

    from deeprec_tpu.data.criteo import CriteoTSV

    reader = CriteoTSV([TSV], batch_size=BATCH)
    t0 = time.perf_counter()
    n = 0
    last = None
    for batch in reader:
        if stage >= 1:
            batch = jax.device_put(batch)
            last = batch
        n += BATCH
    if last is not None:
        jax.block_until_ready(last)
        float(np.asarray(last["label"])[0])  # value readback
    dt = time.perf_counter() - t0
    return n / dt


def main():
    n_rows, nbytes = gen_tsv()
    print(f"TSV: {n_rows/1e6:.1f}M rows, {nbytes/2**30:.2f} GiB", flush=True)
    import jax

    if "--tpu" not in sys.argv:
        # sitecustomize forces the axon TPU backend; loopback = CPU
        jax.config.update("jax_platforms", "cpu")

    r = run(0, n_rows)
    print(f"stage A  parse+batch assembly: {r/1e6:.2f}M ex/s "
          f"({r*nbytes/n_rows/2**20:.0f} MB/s)", flush=True)
    r = run(1, n_rows)
    dev = jax.devices()[0].platform
    print(f"stage B  + device_put[{dev}]: {r/1e6:.2f}M ex/s", flush=True)
    os.remove(TSV)


if __name__ == "__main__":
    main()
