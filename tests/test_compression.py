"""Sample-aware graph compression + multihost helper tests."""

import jax
import jax.numpy as jnp
import numpy as np

from deeprec_tpu.models.compression import compress_user_item, sample_aware_forward
from deeprec_tpu.parallel import multihost


def test_sample_aware_forward_matches_uncompressed():
    B, NU, D = 12, 4, 8
    user_index = jnp.asarray(np.repeat(np.arange(4), 3), jnp.int32)
    user_feats = {
        "u": jnp.asarray(np.repeat(np.arange(4)[:, None], 16, 1),
                         jnp.float32)[user_index]
    }
    item_feats = jnp.asarray(np.arange(B)[:, None] * np.ones((1, 8)),
                             jnp.float32)
    calls = []

    def user_fn(f):
        calls.append(f["u"].shape)
        return f["u"][:, :D] * 2.0

    def item_fn(items, urep):
        return jnp.sum(items * urep, axis=1)

    out = sample_aware_forward(user_fn, item_fn, user_feats, item_feats,
                               user_index, NU)
    want = jnp.sum(item_feats * (user_feats["u"][:, :D] * 2.0), axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)
    assert calls[0][0] == NU  # user tower ran once per user, not per example


def test_compress_picks_first_occurrence():
    idx = jnp.asarray([2, 0, 2, 1, 0], jnp.int32)
    feats = {"x": jnp.arange(5, dtype=jnp.float32)[:, None]}
    comp, expand = compress_user_item(feats, idx, 3)
    np.testing.assert_array_equal(np.asarray(comp["x"][:, 0]), [1, 3, 0])
    back = expand(comp)
    np.testing.assert_array_equal(np.asarray(back["x"][:, 0]), [0, 1, 0, 3, 1])


def test_multihost_single_process():
    mesh = multihost.initialize()
    assert mesh.shape["data"] == len(jax.devices())
    g = multihost.global_batch(mesh, {"x": np.arange(16, dtype=np.float32)})
    assert g["x"].shape == (16,)
