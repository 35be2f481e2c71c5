#!/usr/bin/env python
"""DIN MODEL-part ablation (round 4): where do the non-engine ms go?

din_ablate.py showed train_step 12.98 ms with ~7.8 ms of engine phases —
the remaining ~4-5 ms is model fwd/bwd + dense update + grad plumbing.
This isolates, interleaved in one process at fixed activations (bf16,
B=2048, L=50, D=64):

  att_fwd       — din_attention_apply forward only
  att_fwdbwd    — + grad wrt (hist, target, params)
  model_fwdbwd  — full DIN forward + BCE + grad wrt (params, acts)
  mlp_fwdbwd    — the top MLP alone

If att_fwdbwd dominates model_fwdbwd, a fused Pallas local-activation-unit
kernel (flash-style: never materialize [B,L,4D]) is the next lever;
otherwise the model part is already XLA-fused flat.

Run: PYTHONPATH=/root/repo:$PYTHONPATH nohup python -u \
     benchmarks/din_model_ablate.py > /tmp/din_model_ablate.log 2>&1 &
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from deeprec_tpu.models import din, nn

    B, L, D = 2048, 50, 2 * din.EMB_DIM  # hist is item++category
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    dt = jnp.bfloat16
    hist = jax.random.normal(ks[0], (B, L, D), dt)
    tgt = jax.random.normal(ks[1], (B, D), dt)
    mask = jnp.ones((B, L), bool).at[:, 40:].set(False)
    dense = jax.random.normal(ks[2], (B, 1), dt)
    label = (jax.random.uniform(ks[3], (B,)) < 0.3).astype(jnp.float32)
    params = jax.tree.map(lambda x: x.astype(dt), din.init_params(ks[4]))

    def _att_loss(p, hist, tgt):
        pooled, _ = nn.din_attention_apply(p["att"], hist, tgt, mask)
        return jnp.sum(pooled.astype(jnp.float32))

    att_fwd = jax.jit(_att_loss)

    @jax.jit
    def att_fwdbwd(p, hist, tgt):
        g = jax.grad(_att_loss, argnums=(0, 1, 2))(p, hist, tgt)
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(g))

    def model_loss(p, hist, tgt):
        hi, ci = jnp.split(hist, 2, axis=-1)
        t_i, t_c = jnp.split(tgt, 2, axis=-1)
        acts = {"item": t_i, "category": t_c,
                "item:hist_item": (hi, mask),
                "category:hist_category": (ci, mask)}
        logits = din.forward(p, {"dense": dense}, acts)
        z = logits.astype(jnp.float32)
        return jnp.mean(jnp.maximum(z, 0) - z * label +
                        jnp.log1p(jnp.exp(-jnp.abs(z))))

    @jax.jit
    def model_fwdbwd(p, hist, tgt):
        l, g = jax.value_and_grad(model_loss, argnums=(0, 1, 2))(p, hist, tgt)
        return l + sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(g))

    x_mlp = jax.random.normal(ks[5], (B, 3 * D + 1), dt)

    @jax.jit
    def mlp_fwdbwd(p, x):
        def f(p, x):
            return jnp.sum(nn.mlp_apply(p["mlp"], x).astype(jnp.float32))
        g = jax.grad(f, argnums=(0, 1))(p, x)
        return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(g))

    fns = {
        "att_fwd": lambda: att_fwd(params, hist, tgt),
        "att_fwdbwd": lambda: att_fwdbwd(params, hist, tgt),
        "model_fwdbwd": lambda: model_fwdbwd(params, hist, tgt),
        "mlp_fwdbwd": lambda: mlp_fwdbwd(params, x_mlp),
    }
    for f in fns.values():
        _ = float(f())

    def window(f, n):
        t0 = time.perf_counter()
        for _ in range(n):
            r = f()
        _ = float(r)
        return time.perf_counter() - t0

    res = {}
    for rep in range(3):
        for name, f in fns.items():
            est = window(f, 4) / 4
            w1 = max(4, int(0.25 / max(est, 1e-5)))
            t1 = window(f, w1)
            t2 = window(f, 4 * w1)
            res.setdefault(name, []).append(
                round((t2 - t1) / (3 * w1) * 1e3, 3))
    for k, v in res.items():
        v = sorted(v)
        print(json.dumps({"phase": k, "ms": v, "med": v[len(v) // 2]}),
              flush=True)


if __name__ == "__main__":
    main()
