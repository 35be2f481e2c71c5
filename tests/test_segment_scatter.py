"""ops/segment_scatter: parity of every dispatch path vs a numpy reference.

The Pallas kernel path is exercised in interpreter mode on the CPU backend
(the real-TPU numbers live in PERF.md); the XLA path is the production CPU
path.  Reference role: the fused sparse-apply scatter kernels
(core/kernels/group_embedding/*, batch.cu.cc:24).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from deeprec_tpu.ops import segment_scatter


def ref_np(dst, rows, cap):
    out = np.zeros((cap, rows.shape[1]), np.float64)
    d = np.asarray(dst)
    r = np.asarray(rows, np.float64)
    for i in range(d.shape[0]):
        if d[i] < cap:
            out[d[i]] += r[i]
    return out


def _mk(pattern, cap, n, d, seed=0):
    rng = np.random.RandomState(seed)
    if pattern == "uniform":
        dst = rng.randint(0, cap, n)
    elif pattern == "zipf":
        dst = (rng.zipf(1.3, n) * 7919) % cap
    elif pattern == "clustered":          # overflows the BIN window -> guard
        dst = np.arange(n) % (cap // 64)
    dst = dst.astype(np.int32)
    dst[:: 11] = cap                      # dropped positions
    rows = rng.randn(n, d).astype(np.float32)
    return jnp.asarray(dst), jnp.asarray(rows)


@pytest.mark.parametrize("pattern", ["uniform", "zipf", "clustered"])
def test_xla_path_parity(pattern):
    cap, n, d = 2048, 1500, 8
    dst, rows = _mk(pattern, cap, n, d)
    got = np.asarray(segment_scatter.scatter_add_rows(dst, rows, cap))
    np.testing.assert_allclose(got, ref_np(dst, rows, cap), rtol=1e-5,
                               atol=1e-5)


def test_dedup_sorted_matches_reference():
    cap, n, d = 512, 400, 4
    dst, rows = _mk("zipf", cap, n, d)
    u_dst, u_rows = segment_scatter._dedup_sorted(dst, rows, cap)
    u_dst, u_rows = np.asarray(u_dst), np.asarray(u_rows, np.float64)
    ref = {}
    dn, rn = np.asarray(dst), np.asarray(rows, np.float64)
    for i in range(n):
        if dn[i] < cap:
            ref[dn[i]] = ref.get(dn[i], 0) + rn[i]
    keys = sorted(ref)
    assert (u_dst < cap).sum() == len(keys)
    for k, key in enumerate(keys):
        assert u_dst[k] == key
        np.testing.assert_allclose(u_rows[k], ref[key], rtol=1e-4, atol=1e-4)
    # padding tail is inert
    assert (u_dst[len(keys):] == cap).all()
    np.testing.assert_allclose(u_rows[len(keys):], 0.0)


@pytest.mark.parametrize("pattern", ["uniform", "zipf"])
@pytest.mark.parametrize("d", [16, 32])
def test_kernel_path_parity_interpret(pattern, d):
    cap, n = 16384, 2048
    dst, rows = _mk(pattern, cap, n, d)
    got = np.asarray(segment_scatter.scatter_add_rows(
        dst, rows, cap, _force="kernel", _interpret=True))
    np.testing.assert_allclose(got, ref_np(dst, rows, cap), rtol=2e-4,
                               atol=2e-4)


def test_kernel_guard_falls_back_on_clustered_ids():
    cap, n, d = 16384, 2048, 16
    dst, rows = _mk("clustered", cap, n, d)
    got = np.asarray(segment_scatter.scatter_add_rows(
        dst, rows, cap, _force="kernel", _interpret=True))
    np.testing.assert_allclose(got, ref_np(dst, rows, cap), rtol=2e-4,
                               atol=2e-4)


def test_kernel_path_nonpow2_dim_pads():
    cap, n, d = 16384, 2048, 12
    dst, rows = _mk("uniform", cap, n, d)
    got = np.asarray(segment_scatter.scatter_add_rows(
        dst, rows, cap, _force="kernel", _interpret=True))
    assert got.shape == (cap, d)
    np.testing.assert_allclose(got, ref_np(dst, rows, cap), rtol=2e-4,
                               atol=2e-4)


def test_empty_and_all_dropped():
    cap, n, d = 16384, 2048, 16
    dst = jnp.full((n,), cap, jnp.int32)
    rows = jnp.ones((n, d), jnp.float32)
    got = np.asarray(segment_scatter.scatter_add_rows(
        dst, rows, cap, _force="kernel", _interpret=True))
    np.testing.assert_allclose(got, 0.0)


@pytest.mark.parametrize("pattern", ["uniform", "zipf", "clustered"])
def test_chunked_path_parity(pattern):
    cap, n, d = 16384, 2048, 16
    dst, rows = _mk(pattern, cap, n, d)
    got = np.asarray(segment_scatter.scatter_add_rows(
        dst, rows, cap, _force="chunked"))
    # cumsum-diff run aggregation carries f32 rounding vs the f64 reference
    np.testing.assert_allclose(got, ref_np(dst, rows, cap), rtol=2e-4,
                               atol=2e-4)


def test_chunked_path_empty():
    cap, n, d = 16384, 2048, 16
    dst = jnp.full((n,), cap, jnp.int32)
    rows = jnp.ones((n, d), jnp.float32)
    got = np.asarray(segment_scatter.scatter_add_rows(
        dst, rows, cap, _force="chunked"))
    np.testing.assert_allclose(got, 0.0)


def test_chunked_path_more_uniques_than_chunk():
    # n_u spans several K-chunks (K = min(16384, n) -> here K = n, so use
    # a tiny K via many uniques relative to n: exercise the clamped final
    # dynamic_slice re-read being idempotent)
    cap, n, d = 32768, 4096, 8
    rng = np.random.RandomState(3)
    dst = jnp.asarray(rng.permutation(cap)[:n].astype(np.int32))  # all unique
    rows = jnp.asarray(rng.randn(n, d).astype(np.float32))
    got = np.asarray(segment_scatter.scatter_add_rows(
        dst, rows, cap, _force="chunked"))
    np.testing.assert_allclose(got, ref_np(dst, rows, cap), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("pattern", ["uniform", "zipf", "clustered"])
def test_stream_path_parity_interpret(pattern):
    # clustered = the adversarial case that needed a guard in the windowed
    # kernel: the stream kernel handles ANY distribution exactly (a hot
    # chunk just loops more windows).  cap/d chosen so cap // OUTER >= 64
    # (the small-grid Mosaic-VMEM guard would otherwise reroute to XLA).
    cap, n, d = 32768, 2048, 64
    dst, rows = _mk(pattern, cap, n, d)
    got = np.asarray(segment_scatter.scatter_add_rows(
        dst, rows, cap, _force="stream", _interpret=True))
    np.testing.assert_allclose(got, ref_np(dst, rows, cap), rtol=2e-4,
                               atol=2e-4)


def test_stream_path_single_hot_id():
    # one id owns 90% of positions — the duplicate-volume stress case
    cap, n, d = 65536, 4096, 32
    rng = np.random.RandomState(9)
    dst = rng.randint(0, cap, n).astype(np.int32)
    dst[: int(n * 0.9)] = 12345
    rows = rng.randn(n, d).astype(np.float32)
    got = np.asarray(segment_scatter.scatter_add_rows(
        jnp.asarray(dst), jnp.asarray(rows), cap, _force="stream",
        _interpret=True))
    ref = ref_np(jnp.asarray(dst), jnp.asarray(rows), cap)
    # a 3.7k-deep f32 summation: tolerance scales with the hot row's mass
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_stream_path_all_dropped():
    cap, n, d = 32768, 2048, 64
    dst = jnp.full((n,), cap, jnp.int32)
    rows = jnp.ones((n, d), jnp.float32)
    got = np.asarray(segment_scatter.scatter_add_rows(
        dst, rows, cap, _force="stream", _interpret=True))
    np.testing.assert_allclose(got, 0.0)


@pytest.mark.parametrize("pattern", ["uniform", "zipf", "clustered"])
def test_stream_path_bf16_exact_f32_accumulation(pattern):
    """bf16 rows ride the stream kernel natively (3x 8-bit id columns, one
    term): the result must EQUAL upcasting the bf16 grads to f32 first —
    the MXU accumulates f32, so no bf16 rounding between partial sums."""

    cap, n, d = 32768, 2048, 64
    dst, rows = _mk(pattern, cap, n, d)
    rows16 = rows.astype(jnp.bfloat16)
    got = segment_scatter.scatter_add_rows(
        dst, rows16, cap, _force="stream", _interpret=True)
    assert got.dtype == jnp.float32
    want = ref_np(dst, rows16.astype(jnp.float32), cap)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_stream_path_bf16_id_packing_reaches_high_slots():
    """Slots above 2^16 exercise all three 8-bit id chunk columns."""

    cap, n, d = 2 ** 18, 2048, 32
    rng = np.random.RandomState(3)
    dst = rng.randint(cap - 5000, cap, n).astype(np.int32)
    dst[::7] = rng.randint(0, 300, len(dst[::7]))
    rows = rng.randn(n, d).astype(np.float32)
    rows16 = jnp.asarray(rows).astype(jnp.bfloat16)
    got = np.asarray(segment_scatter.scatter_add_rows(
        jnp.asarray(dst), rows16, cap, _force="stream", _interpret=True))
    want = ref_np(jnp.asarray(dst), rows16.astype(jnp.float32), cap)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_bf16_non_stream_paths_upcast():
    """Every non-stream strategy upcasts bf16 before accumulating (a raw
    bf16 .at[].add would round between partial sums)."""

    cap, n, d = 2048, 1500, 8
    dst, rows = _mk("zipf", cap, n, d)
    rows16 = rows.astype(jnp.bfloat16)
    for force in ("xla", "chunked", "kernel"):
        kw = {"_interpret": True} if force == "kernel" else {}
        got = segment_scatter.scatter_add_rows(
            dst, rows16, cap, _force=force, **kw)
        assert got.dtype == jnp.float32, force
        np.testing.assert_allclose(
            np.asarray(got), ref_np(dst, rows16.astype(jnp.float32), cap),
            rtol=2e-4, atol=2e-4, err_msg=force)


def test_default_dispatch_routes(monkeypatch):
    """Production dispatch contract (round-4 re-verdict, PERF.md): the XLA
    scatter is the default at EVERY shape — in-step interleaved A/Bs at
    din/dlrm/dlrm_proxy/dien show xla ties or wins since the round-3c
    backend.  The Pallas strategies must stay _force-reachable (measured
    alternates for a future backend bump) and must never be entered by
    default."""

    routed = []

    def fake_stream(dst, rows, cap, OUTER, W_OUT, BIN, terms, interpret):
        routed.append("stream")
        return jnp.zeros((cap, rows.shape[1]), rows.dtype)

    monkeypatch.setattr(segment_scatter.jax, "default_backend",
                        lambda: "tpu")
    monkeypatch.setattr(segment_scatter, "_stream_path", fake_stream)

    rows_big = jnp.ones((32768, 32), jnp.float32)
    dst_big = jnp.zeros((32768,), jnp.int32)
    # the round-2d stream regime (TPU, f32, n >= 32k, big cap) now takes
    # the XLA scatter by default
    segment_scatter.scatter_add_rows(dst_big, rows_big, 2 ** 19)
    segment_scatter.scatter_add_rows(
        dst_big, rows_big.astype(jnp.bfloat16), 2 ** 19)
    assert routed == []

    # the alternates remain force-reachable
    segment_scatter.scatter_add_rows(dst_big, rows_big, 2 ** 19,
                                     _force="stream")
    assert routed == ["stream"]

