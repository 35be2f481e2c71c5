"""Fused Pallas GRU/AUGRU parity vs the lax.scan reference (interpret
mode on the CPU backend — same kernel code Mosaic compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprec_tpu.models import nn
from deeprec_tpu.ops import pallas_gru as pg

B, L, D, H = 16, 7, 16, 24


def _setup(seed=0, d=D, h=H):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    p = nn.gru_init(k1, d, h)
    xs = jax.random.normal(k2, (B, L, d), jnp.float32)
    att = jax.nn.sigmoid(jax.random.normal(k3, (B, L), jnp.float32))
    lens = jax.random.randint(k4, (B,), 1, L + 1)
    mask = jnp.arange(L)[None, :] < lens[:, None]
    return p, xs, att, mask


def test_gru_forward_parity():
    p, xs, att, mask = _setup()
    want_o, want_f = nn.gru_apply(p, xs, mask)
    got_o, got_f = pg.gru_sequence(p, xs, mask=mask, interpret=True)
    np.testing.assert_allclose(got_o, want_o, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_f, want_f, rtol=1e-5, atol=1e-6)


def test_gru_forward_parity_no_mask():
    p, xs, att, _ = _setup(1)
    want_o, want_f = nn.gru_apply(p, xs, None)
    got_o, got_f = pg.gru_sequence(p, xs, interpret=True)
    np.testing.assert_allclose(got_o, want_o, rtol=1e-5, atol=1e-6)


def test_augru_forward_parity():
    p, xs, att, mask = _setup(2)
    want_o, want_f = nn.augru_apply(p, xs, att, mask)
    got_o, got_f = pg.gru_sequence(p, xs, att=att, mask=mask,
                                   interpret=True)
    np.testing.assert_allclose(got_o, want_o, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_f, want_f, rtol=1e-5, atol=1e-6)


def _loss_scan(p, xs, att, mask, use_att):
    o, f = (nn.augru_apply(p, xs, att, mask) if use_att
            else nn.gru_apply(p, xs, mask))
    return jnp.sum(jnp.sin(o)) + 2.0 * jnp.sum(f ** 2)


def _loss_fused(p, xs, att, mask, use_att):
    o, f = pg.gru_sequence(p, xs, att=att if use_att else None, mask=mask,
                           interpret=True)
    return jnp.sum(jnp.sin(o)) + 2.0 * jnp.sum(f ** 2)


@pytest.mark.parametrize("use_att", [False, True])
def test_gradients_parity(use_att):
    p, xs, att, mask = _setup(3)
    args = (p, xs, att)
    g_want = jax.grad(lambda p_, x_, a_: _loss_scan(p_, x_, a_, mask,
                                                    use_att),
                      argnums=(0, 1, 2))(*args)
    g_got = jax.grad(lambda p_, x_, a_: _loss_fused(p_, x_, a_, mask,
                                                    use_att),
                     argnums=(0, 1, 2))(*args)
    for k in g_want[0]:
        np.testing.assert_allclose(g_got[0][k], g_want[0][k],
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    np.testing.assert_allclose(g_got[1], g_want[1], rtol=2e-4, atol=2e-5)
    if use_att:
        np.testing.assert_allclose(g_got[2], g_want[2], rtol=2e-4,
                                   atol=2e-5)
    else:
        # att unused -> zero cotangent
        assert float(jnp.abs(g_got[2]).max()) == 0.0


def test_supported_gate():
    assert pg.supported(2048, 50, 64, 64)
    assert not pg.supported(2047, 50, 64, 64)   # not tileable
    assert not pg.supported(2048, 50, 63, 64)   # dim not 8-aligned
    # a batch tile always exists down to 8 rows, so the only hard VMEM
    # blowout is a sequence too long for the [TB, L] planes at TB=8
    assert not pg.supported(8, 600_000, 128, 128)
