"""int64 key support (the reference supports int64 ids throughout;
embedding_variable_ops_test.py covers multiple key dtypes).

x64 must be enabled before JAX initializes, so this runs in a subprocess.
"""

import subprocess
import sys
import textwrap


def test_int64_keys_subprocess():
    code = textwrap.dedent("""
        import os
        os.environ["JAX_ENABLE_X64"] = "1"
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        import numpy as np
        from deeprec_tpu.embedding import table as ev
        from deeprec_tpu.optimizers import sparse

        t = ev.create("t", dim=4, capacity=256, key_dtype=jnp.int64)
        assert t.keys.dtype == jnp.int64
        # ids beyond int32 range
        big = jnp.asarray([2**40 + 1, 2**50 + 7, 5, 2**40 + 1], jnp.int64)
        o = sparse.adagrad(lr=0.1)
        t = o.init(t)
        t, lk = ev.lookup_phase(t, big, step=0)
        assert int(t.size) == 3
        g = jnp.ones((lk.uids.shape[0], 4), jnp.float32)
        t = o.apply(t, lk, g, step=0)
        emb = ev.lookup(t, big)
        np.testing.assert_array_equal(np.asarray(emb[0]), np.asarray(emb[3]))
        assert bool(jnp.all(ev.contains(t, big)))
        f = np.asarray(ev.get_frequency(t, jnp.asarray([2**40 + 1], jnp.int64)))
        assert f[0] == 2
        print("INT64_OK")
    """)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300, cwd="/root/repo")
    assert "INT64_OK" in r.stdout, r.stdout + r.stderr
