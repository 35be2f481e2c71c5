"""Test harness: force an 8-device virtual CPU mesh.

Mirrors the reference's in-process multi-task test style (SURVEY.md §4) — all
sharding/collective tests run on a simulated mesh, no real TPU pod needed.

Note: this machine's sitecustomize registers the axon TPU backend and
overrides ``jax_platforms`` at interpreter start, so an env var alone is not
enough — we must override the jax config again after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (import after env setup)
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _bound_compile_cache():
    """Drop jit caches between test modules.

    The full suite performs ~200+ XLA CPU compilations in one process;
    jaxlib's CPU JIT segfaults deterministically once enough compiled
    executables accumulate (observed at ~test 183 inside
    backend_compile_and_load; each half of the suite passes in isolation).
    Clearing per module bounds live executables at the cost of a few
    recompiles."""

    yield
    jax.clear_caches()
