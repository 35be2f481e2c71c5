"""Fused GRU / AUGRU recurrence as a Pallas TPU kernel.

The reference runs DIEN's interest-extraction GRU and attention-update GRU
(AUGRU) as per-step TF ops (modelzoo/dien/train.py); the JAX port's
``lax.scan`` issues L tiny steps whose while-loop iteration overhead and
per-step residual round-trips dominate.  The kernel's shape is dictated by
the recurrence's SEQUENTIAL dependency: the only parallel axis is the
batch, so the grid is (batch tiles, L) with the LAST dimension iterating
fastest — every grid step processes the FULL batch tile of one timestep
(large MXU matmuls), while the hidden state, the gate weights and the
attention/mask columns stay resident in VMEM scratch across all L steps.
(A first cut tiled the batch into VMEM-sized sequence blocks and looped L
inside the kernel — 16x more sequential steps of 16x smaller matmuls,
measured exactly as slow as lax.scan.  The recurrence is latency-bound:
minimize sequential steps, maximize per-step width.)

Backward recomputes the gates from the stored step outputs (h_{t-1} is
outs[t-1]; z/r/hh are pure functions of (x_t, h_{t-1})) instead of
materializing [L, B, 3H] residuals — rematerialization trades cheap MXU
passes for HBM traffic.  Weight gradients accumulate in VMEM scratch
across the whole grid and are emitted once.

AUGRU is the same kernel with the update gate scaled by a per-step
attention scalar (``zu = a_t * z_t``); plain GRU passes ``att = 1``.
Masked (padded) steps carry state through unchanged, matching the
lax.scan reference semantics (parity: tests/test_pallas_gru.py, interpret
mode on CPU — the same kernel code Mosaic compiles on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lane_pad(d: int) -> int:
    return -(-d // 128) * 128


def _pick_tile(b: int, l: int, d: int, h: int) -> int:
    """Largest batch tile fitting the backward working set in VMEM:
    4 revolving [1, TB, pad] blocks (xs, h_prev, douts, dxs) double-
    buffered + 3 [TB, pad(L)] planes (att, mask, datt scratch) + carry."""

    pad = max(_lane_pad(d), _lane_pad(h))
    lp = _lane_pad(l)
    for t in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if b % t:
            continue
        # 5 revolving [1, TB, pad] blocks (xs, hprev, douts, dxs, dfin)
        # double-buffered + dh carry; 5 [TB, pad(L)] planes (att, mask,
        # datt out x2, datt scratch)
        blocks = (2 * 5 + 1) * t * pad * 4
        planes = 5 * t * lp * 4
        if blocks + planes <= 12 * 1024 * 1024:
            return t
    return 0


def _gru_fwd_kernel(xs_ref, att_ref, m_ref, wx_ref, wh_ref, b_ref,
                    outs_ref, final_ref, h_scr):
    """Grid (NB, L), L fastest.  Blocks: xs [1, TB, D] (step t of tile nb);
    att/m [TB, L]; weights whole; outs [1, TB, H]; final [TB, H]."""

    t = pl.program_id(1)
    L = pl.num_programs(1)
    H = wh_ref.shape[0]

    @pl.when(t == 0)
    def _():
        h_scr[:] = jnp.zeros(h_scr.shape, h_scr.dtype)

    wx = wx_ref[:].astype(jnp.float32)
    wh = wh_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    x = xs_ref[0].astype(jnp.float32)                # [TB, D]
    h = h_scr[:]
    gx = jnp.dot(x, wx, preferred_element_type=jnp.float32) + b
    gh = jnp.dot(h, wh[:, :2 * H], preferred_element_type=jnp.float32)
    zr = jax.nn.sigmoid(gx[:, :2 * H] + gh)
    z, r = zr[:, :H], zr[:, H:]
    rh = r * h
    hh = jnp.tanh(gx[:, 2 * H:]
                  + jnp.dot(rh, wh[:, 2 * H:],
                            preferred_element_type=jnp.float32))
    # dynamic lane slicing must be 128-aligned on TPU — select the step's
    # column with an iota mask instead (VPU-cheap at L <= a few hundred)
    lane = jax.lax.broadcasted_iota(jnp.int32, att_ref.shape, 1)
    sel = (lane == t).astype(jnp.float32)
    a = jnp.sum(att_ref[:].astype(jnp.float32) * sel, axis=1,
                keepdims=True)                       # [TB, 1]
    m = jnp.sum(m_ref[:].astype(jnp.float32) * sel, axis=1, keepdims=True)
    zu = a * z
    hn = (1.0 - zu) * h + zu * hh
    hn = m * hn + (1.0 - m) * h
    h_scr[:] = hn
    outs_ref[0] = hn.astype(outs_ref.dtype)

    @pl.when(t == L - 1)
    def _():
        final_ref[:] = h_scr[:].astype(final_ref.dtype)


def _gru_bwd_kernel(xs_ref, att_ref, m_ref, wx_ref, wh_ref, b_ref,
                    hprev_ref, douts_ref, dfin_ref,
                    dxs_ref, datt_ref, dwx_ref, dwh_ref, db_ref,
                    dh_scr, dwx_scr, dwh_scr, db_scr, datt_scr):
    """Grid (NB, L) visiting t = L-1 .. 0 per batch tile; gate
    recomputation; per-tile datt and global weight grads accumulate in
    scratch and are emitted on their last visit."""

    i = pl.program_id(1)
    L = pl.num_programs(1)
    nb = pl.program_id(0)
    NB = pl.num_programs(0)
    t = L - 1 - i
    H = wh_ref.shape[0]

    @pl.when(i == 0)
    def _():
        dh_scr[:] = dfin_ref[:].astype(jnp.float32)
        datt_scr[:] = jnp.zeros(datt_scr.shape, datt_scr.dtype)

    @pl.when(jnp.logical_and(i == 0, nb == 0))
    def _():
        dwx_scr[:] = jnp.zeros(dwx_scr.shape, dwx_scr.dtype)
        dwh_scr[:] = jnp.zeros(dwh_scr.shape, dwh_scr.dtype)
        db_scr[:] = jnp.zeros(db_scr.shape, db_scr.dtype)

    wx = wx_ref[:].astype(jnp.float32)
    wh = wh_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    x = xs_ref[0].astype(jnp.float32)
    # h_{t-1}: block at max(t-1, 0); zero at t == 0
    h_prev = jnp.where(t > 0, hprev_ref[0].astype(jnp.float32), 0.0)

    # -- recompute the gates exactly as the forward did
    gx = jnp.dot(x, wx, preferred_element_type=jnp.float32) + b
    gh = jnp.dot(h_prev, wh[:, :2 * H], preferred_element_type=jnp.float32)
    zr = jax.nn.sigmoid(gx[:, :2 * H] + gh)
    z, r = zr[:, :H], zr[:, H:]
    rh = r * h_prev
    hh = jnp.tanh(gx[:, 2 * H:]
                  + jnp.dot(rh, wh[:, 2 * H:],
                            preferred_element_type=jnp.float32))
    lane = jax.lax.broadcasted_iota(jnp.int32, att_ref.shape, 1)
    sel = (lane == t).astype(jnp.float32)
    a = jnp.sum(att_ref[:].astype(jnp.float32) * sel, axis=1, keepdims=True)
    m = jnp.sum(m_ref[:].astype(jnp.float32) * sel, axis=1, keepdims=True)
    zu = a * z

    dh_total = dh_scr[:] + douts_ref[0].astype(jnp.float32)
    g = dh_total * m                       # through the gated update
    carry = dh_total * (1.0 - m)           # masked steps pass through
    dzu = g * (hh - h_prev)
    dhh = g * zu
    dh_prev = g * (1.0 - zu) + carry
    da = jnp.sum(dzu * z, axis=1, keepdims=True)
    datt_scr[:] += da * sel
    dz = dzu * a
    dhh_pre = dhh * (1.0 - hh * hh)
    dz_pre = dz * z * (1.0 - z)
    drh = jnp.dot(dhh_pre, wh[:, 2 * H:].T,
                  preferred_element_type=jnp.float32)
    dr = drh * h_prev
    dh_prev = dh_prev + drh * r
    dr_pre = dr * r * (1.0 - r)
    dzr_pre = jnp.concatenate([dz_pre, dr_pre], axis=1)     # [TB, 2H]
    dh_prev = dh_prev + jnp.dot(dzr_pre, wh[:, :2 * H].T,
                                preferred_element_type=jnp.float32)
    dg = jnp.concatenate([dzr_pre, dhh_pre], axis=1)        # [TB, 3H]
    dxs_ref[0] = jnp.dot(dg, wx.T, preferred_element_type=jnp.float32
                         ).astype(dxs_ref.dtype)
    dwx_scr[:] += jnp.dot(x.T, dg, preferred_element_type=jnp.float32)
    dwh_scr[:, :2 * H] += jnp.dot(h_prev.T, dzr_pre,
                                  preferred_element_type=jnp.float32)
    dwh_scr[:, 2 * H:] += jnp.dot(rh.T, dhh_pre,
                                  preferred_element_type=jnp.float32)
    db_scr[:] += jnp.sum(dg, axis=0, keepdims=True)
    dh_scr[:] = dh_prev

    @pl.when(i == L - 1)
    def _():
        datt_ref[:] = datt_scr[:].astype(datt_ref.dtype)

    @pl.when(jnp.logical_and(i == L - 1, nb == NB - 1))
    def _():
        dwx_ref[:] = dwx_scr[:]
        dwh_ref[:] = dwh_scr[:]
        db_ref[:] = db_scr[:]


def _fwd_call(wx, wh, b, xs, att, mask, *, interpret: bool):
    L, B, D = xs.shape
    H = wh.shape[0]
    TB = _pick_tile(B, L, D, H)
    b2 = b.reshape(1, -1)
    outs, final = pl.pallas_call(
        _gru_fwd_kernel,
        grid=(B // TB, L),
        in_specs=[
            pl.BlockSpec((1, TB, D), lambda nb, t: (t, nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, L), lambda nb, t: (nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, L), lambda nb, t: (nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * H), lambda nb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda nb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda nb, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB, H), lambda nb, t: (t, nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, H), lambda nb, t: (nb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, B, H), xs.dtype),
            jax.ShapeDtypeStruct((B, H), xs.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((TB, H), jnp.float32)],
        interpret=interpret,
    )(xs, att, mask, wx, wh, b2)
    return outs, final


def _bwd_call(wx, wh, b, xs, att, mask, outs, douts, dfin, *,
              interpret: bool):
    L, B, D = xs.shape
    H = wh.shape[0]
    TB = _pick_tile(B, L, D, H)
    b2 = b.reshape(1, -1)

    def rev(nb, i):
        return (L - 1 - i, nb, 0)

    def rev_prev(nb, i):
        return (jnp.maximum(L - 2 - i, 0), nb, 0)

    dxs, datt, dwx, dwh, db = pl.pallas_call(
        _gru_bwd_kernel,
        grid=(B // TB, L),
        in_specs=[
            pl.BlockSpec((1, TB, D), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, L), lambda nb, i: (nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, L), lambda nb, i: (nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * H), lambda nb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda nb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda nb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, H), lambda nb, i: (nb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB, D), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, L), lambda nb, i: (nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * H), lambda nb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda nb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda nb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, B, D), xs.dtype),
            jax.ShapeDtypeStruct((B, L), att.dtype),
            jax.ShapeDtypeStruct((D, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((D, 3 * H), jnp.float32),
            pltpu.VMEM((H, 3 * H), jnp.float32),
            pltpu.VMEM((1, 3 * H), jnp.float32),
            pltpu.VMEM((TB, L), jnp.float32),
        ],
        interpret=interpret,
    )(xs, att, mask, wx, wh, b2, outs, douts, dfin)
    return dxs, datt, dwx, dwh, db.reshape(-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _gru_core(wx, wh, b, xs, att, mask, interpret):
    outs, final = _fwd_call(wx, wh, b, xs, att, mask, interpret=interpret)
    return outs, final


def _gru_core_fwd(wx, wh, b, xs, att, mask, interpret):
    outs, final = _fwd_call(wx, wh, b, xs, att, mask, interpret=interpret)
    return (outs, final), (wx, wh, b, xs, att, mask, outs)


def _gru_core_bwd(interpret, res, grads):
    wx, wh, b, xs, att, mask, outs = res
    douts, dfin = grads
    dxs, datt, dwx, dwh, db = _bwd_call(
        wx, wh, b, xs, att, mask, outs,
        douts, dfin.astype(jnp.float32), interpret=interpret)
    return (dwx.astype(wx.dtype), dwh.astype(wh.dtype), db.astype(b.dtype),
            dxs, datt, jnp.zeros_like(mask))


_gru_core.defvjp(_gru_core_fwd, _gru_core_bwd)


def supported(b: int, l: int, d: int, h: int) -> bool:
    """Kernel constraints: batch tileable, 8-aligned dims, and a tile size
    exists whose backward working set fits VMEM."""

    if d % 8 or h % 8:
        return False
    return _pick_tile(b, l, d, h) > 0


def gru_sequence(params, xs, att: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 *, interpret: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused recurrence over ``xs`` [B, L, D] with the concat-layout params
    of ``nn.gru_init`` ({wz, wr, wh: [D+H, H], bz, br, bh}).  Returns
    (outs [B, L, H], final [B, H]); ``att`` [B, L] turns it into AUGRU."""

    b_, l, d = xs.shape
    h = params["bz"].shape[0]
    # split the concat weights into x- and h- halves, gate-major columns
    wx = jnp.concatenate([params["wz"][:d], params["wr"][:d],
                          params["wh"][:d]], axis=1)
    whh = jnp.concatenate([params["wz"][d:], params["wr"][d:],
                           params["wh"][d:]], axis=1)
    bias = jnp.concatenate([params["bz"], params["br"], params["bh"]])
    xs_t = jnp.moveaxis(xs, 1, 0)                     # [L, B, D]
    att_t = (jnp.ones((b_, l), jnp.float32) if att is None
             else att.astype(jnp.float32))
    m_t = (jnp.ones((b_, l), jnp.float32) if mask is None
           else mask.astype(jnp.float32))
    outs, final = _gru_core(wx, whh, bias, xs_t, att_t, m_t, interpret)
    return jnp.moveaxis(outs, 0, 1), final
