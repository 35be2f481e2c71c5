"""Interleaved A/B: v3 per-position probe vs v4 dedup lookup (REJECTED).

Reconstructs the engine-v4 prototype that PERF.md's "Engine v4 lookup dedup"
rejected-optimization entry describes, so the rejection can be re-verified if
the id distribution ever changes.  Measured round 2e at the production DIN
distribution (209k group-composed ids, ~65k uniques, load factor ~0.73):
v3 probe 6.2 ms vs dedup 10.9 ms — the >=3 lane-wide (209k) scalar
gathers/scatters needed to expand unique slots back to positions cost
~1.3 ms each, more than the whole probe saving.

Run on the TPU IN BACKGROUND (CLAUDE.md):
  PYTHONPATH=/root/repo:$PYTHONPATH nohup python -u benchmarks/dedup_ab.py &

Timing: interleaved same-process reps (this box drifts +-45% across
minutes), value readback at every window boundary, slope between two
window sizes.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from deeprec_tpu.data.behavior import SyntheticBehavior
from deeprec_tpu.embedding import table as ev
from deeprec_tpu.embedding.group import group_key

BATCH = 2048
SEQ = 50
ID_BITS = 26
N_BATCHES = 8


def din_group_ids(rng_seed: int):
    """Group-composed id stream of one DIN step: item+category features,
    candidates + histories -> 2048 * (2*50 + 2) = 208,896 keys."""
    gen = SyntheticBehavior(batch_size=BATCH, seq_len=SEQ,
                            num_items=200_000, seed=rng_seed)
    rng = np.random.RandomState(rng_seed)
    out = []
    for _ in range(N_BATCHES):
        b = gen.sample(rng)["cat"]
        emp = int(np.iinfo(np.int32).min)
        parts = []
        for feat, cols in ((0, ("item", "hist_item")),
                           (1, ("category", "hist_category"))):
            for c in cols:
                ids = jnp.asarray(b[c]).reshape(-1)  # int32, EMPTY = int32 min
                parts.append(group_key(ids, feat, ID_BITS, emp))
        out.append(jnp.concatenate(parts))
    return out


def build_table(batches):
    tbl = ev.create("din_group", 32, key_dtype=jnp.int32, capacity=2 ** 18)
    lookup = jax.jit(lambda t, i: ev._lookup_phase(t, i, train=True))
    for ids in batches:
        tbl, _ = lookup(tbl, ids)
    n, c = int(tbl.size), tbl.capacity
    print(f"table: {n} live / {c} capacity (LF {n / c:.2f})", flush=True)
    return tbl


# -- strategy A: v3 per-position probe (the shipped engine) -----------------

def probe_v3(keys, ids):
    valid = ids != ev.empty_key(ids.dtype)
    _, slot_ids, _, _ = ev._find_or_insert(
        keys, ids, jnp.zeros_like(valid), valid)
    return slot_ids


# -- strategy B: v4 dedup (sort -> compact uniques -> probe -> expand) ------

U_PAD = 1 << 17  # static unique-count bound for this distribution (~65k live)


def probe_v4_dedup(keys, ids):
    n = ids.shape[0]
    order = jnp.argsort(ids)
    sid = ids[order]
    head = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sid[1:] != sid[:-1]])
    # compact run heads to a padded unique list (bool-argsort compaction:
    # stable sort by ~head moves heads to the front)
    comp = jnp.argsort(~head)[:U_PAD]
    uids = jnp.where(head[comp], sid[comp], ev.empty_key(ids.dtype))
    uvalid = uids != ev.empty_key(ids.dtype)
    _, uslot, _, _ = ev._find_or_insert(
        keys, uids, jnp.zeros_like(uvalid), uvalid)
    # expand: unique index of each sorted position = cumsum(head)-1, then
    # unsort back to batch order via scatter (the measured-cheaper unsort).
    uidx = jnp.cumsum(head.astype(jnp.int32)) - 1
    slot_sorted = uslot[jnp.minimum(uidx, U_PAD - 1)]
    return jnp.zeros((n,), jnp.int32).at[order].set(slot_sorted)


def main():
    batches = din_group_ids(7)
    tbl = build_table(batches)
    keys = tbl.keys

    a = jax.jit(lambda k, i: jnp.sum(probe_v3(k, i)))
    b = jax.jit(lambda k, i: jnp.sum(probe_v4_dedup(k, i)))

    # parity
    sa = jax.jit(probe_v3)(keys, batches[0])
    sb = jax.jit(probe_v4_dedup)(keys, batches[0])
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    print("parity: OK", flush=True)

    uniq = len(np.unique(np.asarray(batches[0])))
    print(f"ids/batch={batches[0].shape[0]}, uniques={uniq}", flush=True)

    def window(fn, n):
        t0 = time.perf_counter()
        s = None
        for i in range(n):
            s = fn(keys, batches[i % N_BATCHES])
        _ = float(s)  # value readback
        return time.perf_counter() - t0

    for fn, name in ((a, "warm A"), (b, "warm B")):
        window(fn, 4)

    REPS = 3
    w1, w2 = 8, 32
    for rep in range(REPS):
        for fn, name in ((a, "v3 per-position"), (b, "v4 dedup     ")):
            t1, t2 = window(fn, w1), window(fn, w2)
            ms = 1e3 * (t2 - t1) / (w2 - w1)
            print(f"rep {rep} {name}: {ms:6.2f} ms/lookup", flush=True)


if __name__ == "__main__":
    main()
