"""Segment scatter-add: sum [N, D] rows into a dense [C, D] buffer by slot id.

TPU-native replacement for the reference's fused GPU sparse-apply /
group-embedding backward scatter kernels (core/kernels/group_embedding/*,
batch.cu.cc:24 ``BatchCopy`` + ``SparseApplyAdagradGPU``): XLA's general
scatter on TPU v5e costs ~105-140 ns per SOURCE ROW when destinations
miss cache (dropped indices included; with few cache-resident unique
destinations it looks ~10x cheaper — a measurement trap), which makes the
gradient accumulate the single most expensive op of a sequence-model
train step (27 ms isolated at DIN's 209k x 32).  This module replaces it:

  1. argsort by destination slot, permute rows into sorted order;
  2. duplicate aggregation: run boundaries + a cumsum whose per-run
     difference is the run's summed row (no scatter anywhere);
  3. compaction of the per-run sums via a stable bool argsort;
  4. a Pallas kernel: grid over output chunks of OUTER rows; two
     scalar-prefetch-indexed input blocks of BIN sorted rows are guaranteed
     to cover the chunk's uniques (uniques within an OUTER-row range are at
     most OUTER; the guard below enforces <= BIN); an iota-compare one-hot
     [BIN, W_OUT] and an MXU matmul place + sum the rows; P_SUB = 128/D
     sub-chunks are lane-packed so the matmul uses all 128 output lanes.

Accuracy: the one-hot is exact in bf16; rows are split into ``terms``
bf16 components (2 terms ~ 1e-5 relative, bounded by the cumsum-diff f32
error, comparable to any large-batch summation order).

STATUS (v5e, honest interleaved readback-slope timing — PERF.md "Segment
scatter" + "Stream kernel" + round-4 re-verdict): production dispatch is
**xla** — the backend caught up (round 3c/4: XLA ties or wins in-step at
every model shape incl. the Kaggle-proxy distribution), and the stream
kernel's round-2d win (DIN 19.6 -> 14.4 ms/step) no longer reproduces.
The ``stream`` (sorted-duplicates DMA + one-hot MXU placement),
``chunked`` (dedup + compact ``.set`` chunks) and ``kernel`` (windowed
dedup'd one-hot, exact with BIN == OUTER) strategies remain reachable via
``_force`` with parity tests, as measured alternates if a backend bump
re-inverts the trade.  Measurement traps documented the hard way:
(1) micro-benchmarks with few unique destinations (zipf-clipped ids)
understate XLA scatter cost ~10x; (2) strategy A/Bs run in separate
processes on this shared box drown in ±45% noise — only interleaved
same-process comparisons are valid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pow2ceil(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


def _xla_scatter(dst, rows, cap):
    return jnp.zeros((cap,) + rows.shape[1:], rows.dtype).at[
        jnp.minimum(dst, cap)].add(rows, mode="drop")


def _dedup_sorted(dst, rows, cap):
    """Sort by dst; aggregate duplicate runs; compact.

    Returns (u_dst [N] sorted unique slots, cap-padded; u_rows [N, D]
    per-unique summed rows, zero-padded).  Rows whose dst >= cap are
    dropped.  No scatter ops anywhere (TPU scatter is the op being
    replaced): run sums come from a cumsum difference, compaction from a
    stable argsort of the run-end flags.
    """

    n = dst.shape[0]
    order = jnp.argsort(dst)
    sdst = dst[order]
    srows = rows[order]
    valid = sdst < cap
    is_end = jnp.concatenate(
        [sdst[1:] != sdst[:-1], jnp.ones((1,), jnp.bool_)]) & valid
    csum = jnp.cumsum(srows, axis=0)
    # Stable argsort of ~is_end lists run-end positions first, in order —
    # the compaction permutation (cheaper than a scatter at these sizes).
    endpos = jnp.argsort(~is_end, stable=True).astype(jnp.int32)
    u_valid = is_end[endpos]
    u_dst = jnp.where(u_valid, sdst[endpos], cap)
    s_end = csum[endpos]
    # Prefix before run j = prefix at run j-1's end (runs contiguous from 0;
    # invalid tail rows only ever feed masked-out entries).
    s_prev = jnp.concatenate([jnp.zeros_like(s_end[:1]), s_end[:-1]])
    u_rows = jnp.where(u_valid[:, None], s_end - s_prev, 0)
    return u_dst, u_rows


def _kern(blk0_ref, ida_ref, idb_ref, ra_ref, rb_ref, out_ref,
          *, OUTER, W_OUT, P_SUB, BIN, D, terms):
    c = pl.program_id(0)
    base = c * OUTER
    iota_rr = jax.lax.broadcasted_iota(jnp.int32, (BIN, W_OUT), 1)
    dn = (((0,), (0,)), ((), ()))
    acc = jnp.zeros((W_OUT, P_SUB * D), jnp.float32)
    for id_ref, r_ref in ((ida_ref, ra_ref), (idb_ref, rb_ref)):
        local = id_ref[...] - base                       # [BIN, 1]
        ok = (local >= 0) & (local < OUTER)
        j = jax.lax.shift_right_logical(local, W_OUT.bit_length() - 1)
        rr = jnp.where(ok, local & (W_OUT - 1), -1)      # invalid: no match
        oh = (rr == iota_rr).astype(jnp.bfloat16)        # [BIN, W_OUT]
        rows = r_ref[...]                                # [BIN, D]
        pieces = [jnp.where(j == jj, rows, 0.0) for jj in range(P_SUB)]
        aug = jnp.concatenate(pieces, axis=1)            # [BIN, P_SUB*D]
        rem = aug
        for _ in range(terms):
            hi = rem.astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                oh, hi, dn, preferred_element_type=jnp.float32)
            rem = rem - hi.astype(jnp.float32)
    out_ref[0, :, :] = acc


def _kernel_path(u_dst, u_rows, starts, cap, OUTER, W_OUT, BIN, terms,
                 interpret):
    n, d = u_rows.shape
    P_SUB = OUTER // W_OUT
    nb = n // BIN + 2
    pad = nb * BIN - n
    u_dst_p = jnp.concatenate([u_dst, jnp.full((pad,), cap, u_dst.dtype)])
    u_rows_p = jnp.concatenate([u_rows, jnp.zeros((pad, d), u_rows.dtype)])
    nc = cap // OUTER
    blk0 = jnp.minimum(starts // BIN, nb - 2)
    ids2d = u_dst_p[:, None]
    packed = pl.pallas_call(
        functools.partial(_kern, OUTER=OUTER, W_OUT=W_OUT, P_SUB=P_SUB,
                          BIN=BIN, D=d, terms=terms),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((BIN, 1), lambda c, blk0: (blk0[c], 0)),
                pl.BlockSpec((BIN, 1), lambda c, blk0: (blk0[c] + 1, 0)),
                pl.BlockSpec((BIN, d), lambda c, blk0: (blk0[c], 0)),
                pl.BlockSpec((BIN, d), lambda c, blk0: (blk0[c] + 1, 0)),
            ],
            out_specs=pl.BlockSpec((1, W_OUT, P_SUB * d),
                                   lambda c, blk0: (c, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nc, W_OUT, P_SUB * d), jnp.float32),
        interpret=interpret,
    )(blk0, ids2d, ids2d, u_rows_p, u_rows_p)
    # unpack lane-packed sub-chunks back to row-major [C, D]
    return packed.reshape(nc, W_OUT, P_SUB, d).transpose(0, 2, 1, 3).reshape(
        cap, d)


def _stream_kern(starts_ref, aug_hbm, out_ref, buf, sems,
                 *, OUTER, W_OUT, P_SUB, BIN, D, DA, terms, id_cols):
    """Stream kernel: per output chunk, DMA a DYNAMIC number of BIN-row
    windows of the (sorted, duplicates-included) position stream and place
    rows with a one-hot MXU matmul — duplicates sum natively, so no dedup
    or compaction prep is needed and the kernel is exact for ANY id
    distribution (a hot id with 100k occurrences just means more windows
    for its chunk).  Double-buffered HBM->VMEM copies overlap the matmuls.

    The destination slot rides as trailing columns of the augmented rows
    array so one aligned DMA moves both — Mosaic cannot slice a [N, 1]
    int stream on the lane dimension.  f32 rows carry it as ONE column
    (ids < 2^24 exact in f32, id_cols == 1); bf16 rows carry THREE 8-bit
    chunk columns (ints <= 255 exact in bf16, id_cols == 3) and the
    kernel reassembles hi*2^16 + mid*2^8 + lo — halving the permute/DMA
    traffic for bf16 gradients while the MXU still accumulates f32
    exactly.  Window starts are rounded down to the dtype's sublane tile
    (f32: 8, bf16: 16); the overlapped leading rows belong to earlier
    chunks and mask out via the range check.
    """

    c = pl.program_id(0)
    sub = 8 if buf.dtype == jnp.float32 else 16
    lo = (starts_ref[c] // sub) * sub
    hi = starts_ref[c + 1]
    nwin = pl.cdiv(hi - lo, BIN)
    base = c * OUTER
    iota_rr = jax.lax.broadcasted_iota(jnp.int32, (BIN, W_OUT), 1)
    dn = (((0,), (0,)), ((), ()))

    def dma(w, slot):
        return pltpu.make_async_copy(
            aug_hbm.at[pl.ds(lo + w * BIN, BIN), :], buf.at[slot],
            sems.at[slot])

    @pl.when(nwin > 0)
    def _():
        dma(0, 0).start()

    def body(w, acc):
        slot = jax.lax.rem(w, 2)
        dma(w, slot).wait()

        @pl.when(w + 1 < nwin)
        def _():
            dma(w + 1, 1 - slot).start()

        aug = buf[slot]                                  # [BIN, DA]
        if id_cols == 1:
            slot_id = aug[:, D:D + 1].astype(jnp.int32)   # [BIN, 1]
        else:
            chunks = [aug[:, D + k:D + k + 1].astype(jnp.int32)
                      for k in range(id_cols)]
            slot_id = chunks[0]
            for ch in chunks[1:]:
                slot_id = (slot_id << 8) | ch
        local = slot_id - base                           # [BIN, 1]
        ok = (local >= 0) & (local < OUTER)
        j = jax.lax.shift_right_logical(local, W_OUT.bit_length() - 1)
        rr = jnp.where(ok, local & (W_OUT - 1), -1)
        oh = (rr == iota_rr).astype(jnp.bfloat16)        # [BIN, W_OUT]
        rows = aug[:, :D]                                # [BIN, D]
        zero = jnp.zeros((), rows.dtype)
        pieces = [jnp.where(j == jj, rows, zero) for jj in range(P_SUB)]
        rem = jnp.concatenate(pieces, axis=1)            # [BIN, P_SUB*D]
        for _ in range(terms):
            hi_part = rem.astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                oh, hi_part, dn, preferred_element_type=jnp.float32)
            if terms > 1:
                rem = rem - hi_part.astype(jnp.float32)
        return acc

    acc0 = jnp.zeros((W_OUT, P_SUB * D), jnp.float32)
    acc = jax.lax.fori_loop(0, nwin, body, acc0)
    out_ref[0, :, :] = acc


def _stream_path(dst, rows, cap, OUTER, W_OUT, BIN, terms, interpret):
    """Sort positions by dst, then run the stream kernel over chunks.

    bf16 rows take the half-traffic layout: the whole augmented array is
    bf16, the slot id rides as three 8-bit chunk columns (exact in bf16),
    and the one term IS the input — accumulation stays f32 in the MXU, so
    the result equals upcasting the bf16 grads to f32 first."""

    n, d = rows.shape
    P_SUB = OUTER // W_OUT
    bf16 = rows.dtype == jnp.bfloat16
    order = jnp.argsort(dst)
    sdst = dst[order]
    srows = rows[order]
    # pad one full extra window (+ start-alignment slack) so any
    # (lo + w*BIN, BIN) slice is in bounds
    nb = n // BIN + 2
    pad = nb * BIN - n
    sdst = jnp.concatenate([sdst, jnp.full((pad,), cap, sdst.dtype)])
    srows = jnp.concatenate([srows, jnp.zeros((pad, d), srows.dtype)])
    # Mosaic lane-pads HBM buffers to 128 and requires DMA slices to cover
    # whole lane tiles, so the augmented array is exactly 128 wide:
    # [rows | slot id column(s) | zero fill].
    da = 128
    if bf16:
        id_cols = 3
        sid = sdst.astype(jnp.int32)
        idc = [((sid >> 16) & 0xFF).astype(jnp.bfloat16)[:, None],
               ((sid >> 8) & 0xFF).astype(jnp.bfloat16)[:, None],
               (sid & 0xFF).astype(jnp.bfloat16)[:, None]]
        aug = jnp.concatenate(
            [srows] + idc
            + [jnp.zeros((srows.shape[0], da - d - 3), jnp.bfloat16)],
            axis=1)
        terms = 1
    else:
        id_cols = 1
        aug = jnp.concatenate(
            [srows, sdst[:, None].astype(jnp.float32),
             jnp.zeros((srows.shape[0], da - d - 1), jnp.float32)], axis=1)
    nc = cap // OUTER
    starts = jnp.searchsorted(
        sdst, (jnp.arange(nc + 1, dtype=jnp.int32) * OUTER).astype(
            sdst.dtype)).astype(jnp.int32)
    packed = pl.pallas_call(
        functools.partial(_stream_kern, OUTER=OUTER, W_OUT=W_OUT,
                          P_SUB=P_SUB, BIN=BIN, D=d, DA=da, terms=terms,
                          id_cols=id_cols),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nc,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((1, W_OUT, P_SUB * d),
                                   lambda c, starts: (c, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, BIN, da), rows.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nc, W_OUT, P_SUB * d), jnp.float32),
        # In SMALL surrounding programs XLA's vmem-offload pass hoists this
        # call's whole HBM stream operand into VMEM "stack" space and trips
        # the default 16M scoped limit (observed on the 53k-id WDL-proxy
        # step at 64/128/256 grid steps; the identical shape inside the
        # larger DLRM program never staged).  Raising the kernel's declared
        # budget makes either placement legal.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(starts, aug)
    out = packed.reshape(nc, W_OUT, P_SUB, d).transpose(0, 2, 1, 3).reshape(
        cap, d)
    return out


def _chunked_path(u_dst, u_rows, n_u, cap, K):
    """Dedup-then-chunked-set: scatter only the live unique rows, K at a time.

    After ``_dedup_sorted`` the destinations are unique, so ``.set`` into a
    zeros buffer equals scatter-add — and XLA's row-scatter cost is per
    SOURCE row (~50-140 ns each, dropped or not), so scattering 209k mostly-
    padding rows wastes ~12 ms while ceil(n_u/K) compact chunks pay only for
    live rows.  ``dynamic_slice`` clamps the last chunk's start, re-reading
    earlier entries — harmless: ``.set`` of the same unique (dst, row) pairs
    is idempotent.  The while_loop carry aliases in place (zero extra cost
    when n_u == 0, unlike ``lax.cond`` which copies its operands through the
    identity branch — measured ~6 ms at [524k, 32])."""

    out = jnp.zeros((cap,) + u_rows.shape[1:], u_rows.dtype)

    def cond(c):
        return c[0] * K < n_u

    def body(c):
        i, out = c
        sl_dst = jax.lax.dynamic_slice_in_dim(u_dst, i * K, K)
        sl_rows = jax.lax.dynamic_slice_in_dim(u_rows, i * K, K)
        return i + 1, out.at[sl_dst].set(sl_rows, mode="drop")

    _, out = jax.lax.while_loop(cond, body, (jnp.int32(0), out))
    return out


def scatter_add_rows(dst, rows, cap, *, terms=2, dedup=True, _force=None,
                     _interpret=False):
    """``zeros([cap, D]).at[dst].add(rows)`` with dst >= cap rows dropped.

    Drop-in for the sparse-apply gradient accumulate.  Default dispatch is
    the XLA scatter at EVERY shape (round-4 re-verdict; CLAUDE.md): the
    Pallas stream/chunked/kernel strategies are measured alternates kept
    reachable via ``_force`` with parity tests, to re-A/B on a backend
    bump.

    ``dedup=False`` skips the run-aggregation (sort + permute only — a
    shorter dependency chain); the kernel sums duplicate ids natively, and
    the window guard then bounds *positions* per chunk rather than uniques,
    so heavily duplicated batches fall back to the XLA scatter.
    ``_force``/``_interpret`` are test hooks.
    """

    n, d = rows.shape
    cap = int(cap)
    # Dispatch history (all interleaved in-step A/Bs on v5e, PERF.md):
    # round 2d's backend made the XLA scatter ~105-140 ns/source-row at
    # production unique-destination counts and the stream kernel won big
    # (DIN 19.6 -> 14.4 ms/step).  Round 3c re-baselined: the isolated gap
    # INVERTED (xla 2.66 vs stream 3.69 ms) and in-step they tied.  Round 4
    # re-verdict (benchmarks/scatter_instep_ab.py at din / dlrm /
    # dlrm-on-the-Kaggle-proxy / dien): xla ties or wins at EVERY shape
    # (din 12.915 vs 12.908, dlrm 3.18/3.18, proxy 3.195/3.196, dien
    # 14.82/14.85 ms/step) — XLA's in-program scatter overlaps neighboring
    # ops and the stream prep (sort + permute) costs exactly its isolated
    # advantage.  Default is therefore **xla**; the stream/chunked/kernel
    # strategies stay reachable via ``_force`` (parity-tested) as measured
    # alternates in case a backend bump re-inverts the trade.
    # Measurement trap that created the round-2 picture: benchmarks with
    # few unique destinations (cache-resident) understate XLA scatter cost
    # ~10x — always benchmark with production-like UNIQUE counts.
    strategy = _force or "xla"
    # Accumulation is ALWAYS f32-exact for bf16 inputs: the stream kernel
    # accumulates bf16 operands in the MXU's f32 accumulator; every other
    # strategy upcasts first.  (A raw bf16 .at[].add would round per
    # partial sum — never do that.)
    if rows.dtype == jnp.bfloat16 and strategy != "stream":
        rows = rows.astype(jnp.float32)
    if strategy == "xla":
        return _xla_scatter(dst, rows, cap)

    dst = dst.astype(jnp.int32)
    if strategy == "chunked":
        u_dst, u_rows = _dedup_sorted(dst, rows, cap)
        n_u = jnp.searchsorted(u_dst, jnp.int32(cap)).astype(jnp.int32)
        return _chunked_path(u_dst, u_rows, n_u, cap, K=min(16384, n))

    if strategy == "stream":
        d_pad = _pow2ceil(d)
        P_SUB = 128 // d_pad
        W_OUT = 256
        OUTER = W_OUT * P_SUB
        # the slot-id column must fit inside the 128-lane augmented row;
        # and at small grid counts Mosaic stages the whole input stream in
        # scoped VMEM (29.5M > 16M limit).  Observed cliff: staged (OOM) at
        # 64 AND 128 grid steps with a 27.8 MB stream, not staged at 256
        # (DLRM production shape, round 2d) — gate at 256.  Small-cap
        # tables keep the XLA scatter.
        # cap must also fit the kernel's id encodings exactly: one f32
        # column (ints < 2^24) or three 8-bit bf16 chunks (same bound) —
        # beyond it slot ids would silently round and corrupt rows.
        if (cap % OUTER or cap // OUTER < 256 or d_pad >= 128
                or cap > (1 << 24)):
            return _xla_scatter(dst, rows.astype(jnp.float32)
                                if rows.dtype == jnp.bfloat16 else rows, cap)
        if d_pad != d:
            rows = jnp.concatenate(
                [rows, jnp.zeros((n, d_pad - d), rows.dtype)], axis=1)
        # BIN must stay sublane-tile aligned: window starts are multiples
        # of BIN, and Mosaic DMA slices must cover whole (8, 128) tiles —
        # a pow2 >= 8 is always 8-aligned (round-4 review: BIN=min(512, n)
        # mis-aligned for n < 512 and divided by zero at n == 0).
        if n == 0:
            return jnp.zeros((cap, d), rows.dtype)
        bin_rows = min(512, max(8, _pow2ceil(n)))
        out = _stream_path(dst, rows, cap, OUTER, W_OUT, bin_rows, terms,
                           _interpret)
        return out[:, :d] if d_pad != d else out

    # strategy == "kernel"
    d_pad = _pow2ceil(d)
    P_SUB = 128 // d_pad
    W_OUT = 256
    OUTER = W_OUT * P_SUB
    if cap % OUTER or cap // OUTER < 8:
        return _xla_scatter(dst, rows, cap)

    if dedup:
        # BIN == OUTER makes the kernel EXACT with no runtime guard: after
        # dedup the (sorted, unique) entries landing in one OUTER-slot chunk
        # number at most OUTER and are contiguous, so two aligned BIN-sized
        # blocks always cover them.  The guard's lax.cond is not a free
        # gate (identity branch copies operands, ~6 ms at [524k, 32]).
        BIN = OUTER
        u_dst, u_rows = _dedup_sorted(dst, rows, cap)
    else:
        # No dedup: the window bounds POSITIONS per chunk, which duplicates
        # can overflow — keep the guarded fallback.
        BIN = min(_pow2ceil(max(128, 3 * n * OUTER // cap)), OUTER)
        order = jnp.argsort(dst)
        u_dst, u_rows = dst[order], rows[order]
    if d_pad != d:
        u_rows = jnp.concatenate(
            [u_rows, jnp.zeros((n, d_pad - d), u_rows.dtype)], axis=1)
    nc = cap // OUTER
    bounds = jnp.searchsorted(
        u_dst, (jnp.arange(nc + 1, dtype=jnp.int32) * OUTER).astype(
            u_dst.dtype)).astype(jnp.int32)
    if dedup:
        out = _kernel_path(u_dst, u_rows, bounds[:-1], cap, OUTER, W_OUT,
                           BIN, terms, _interpret)
    else:
        max_cnt = jnp.max(bounds[1:] - bounds[:-1])
        out = jax.lax.cond(
            max_cnt <= BIN,
            lambda a, b, s: _kernel_path(a, b, s, cap, OUTER, W_OUT, BIN,
                                         terms, _interpret),
            lambda a, b, s: _xla_scatter(a, b, cap),
            u_dst, u_rows, bounds[:-1])
    return out[:, :d] if d_pad != d else out
