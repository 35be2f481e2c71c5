"""Dense-parameter optimizers: DeepRec's AdagradDecay and AdamAsync as optax
gradient transformations (the reference's dense variants in
training_ali_ops.cc:266,437 / adagrad_decay.py / adam_async.py).

These compose with any optax chain and with the Trainer's ``dense_tx``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdagradDecayState(NamedTuple):
    accumulator: optax.Updates
    step: jnp.ndarray


def adagrad_decay(
    learning_rate: float = 0.01,
    initial_accumulator_value: float = 0.1,
    accumulator_decay_step: int = 100000,
    accumulator_decay_rate: float = 0.9,
    accumulator_baseline: float = 1e-7,
    epsilon: float = 1e-10,
) -> optax.GradientTransformation:
    """ApplyAdagradDecay: periodically decays the accumulator so late data
    isn't drowned by stale second-moment mass (docs_en AdagradDecay)."""

    def init(params):
        acc = jax.tree.map(
            lambda p: jnp.full_like(p, initial_accumulator_value), params)
        return AdagradDecayState(acc, jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        step = state.step + 1
        decay_now = (step % accumulator_decay_step) == 0

        def upd(g, a):
            a = jnp.where(decay_now,
                          jnp.maximum(a * accumulator_decay_rate,
                                      accumulator_baseline), a)
            a = a + jnp.square(g)
            return -learning_rate * g * jax.lax.rsqrt(a + epsilon), a

        # Two parallel maps, NOT a tuple-leaf map: an is_leaf=tuple
        # unpacking would stop at tuple/NamedTuple CONTAINER nodes of the
        # params pytree itself and scramble updates/state (round-4 review).
        new_updates = jax.tree.map(lambda g, a: upd(g, a)[0],
                                   updates, state.accumulator)
        new_acc = jax.tree.map(lambda g, a: upd(g, a)[1],
                               updates, state.accumulator)
        return new_updates, AdagradDecayState(new_acc, step)

    return optax.GradientTransformation(init, update)


class AdamAsyncState(NamedTuple):
    m: optax.Updates
    v: optax.Updates
    beta1_power: jnp.ndarray
    beta2_power: jnp.ndarray


def adam_async(
    learning_rate: float = 0.001,
    b1: float = 0.9,
    b2: float = 0.999,
    epsilon: float = 1e-8,
) -> optax.GradientTransformation:
    """ApplyAdamAsync: power accumulators carried in state (not recomputed
    from a global step), matching the async-PS-safe formulation."""

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        z2 = jax.tree.map(jnp.zeros_like, params)
        return AdamAsyncState(z, z2, jnp.ones(()), jnp.ones(()))

    def update(updates, state, params=None):
        b1p = state.beta1_power * b1
        b2p = state.beta2_power * b2
        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, state.m, updates)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * jnp.square(g),
                         state.v, updates)
        lr_t = learning_rate * jnp.sqrt(1 - b2p) / (1 - b1p)
        new_updates = jax.tree.map(
            lambda mm, vv: -lr_t * mm / (jnp.sqrt(vv) + epsilon), m, v)
        return new_updates, AdamAsyncState(m, v, b1p, b2p)

    return optax.GradientTransformation(init, update)
