"""Distributed trainer: SPMD data-parallel batch + row-sharded tables.

The multi-chip equivalent of the reference's PS/worker and SOK collective
modes (SURVEY.md §2.4): one ``shard_map``-wrapped train step over a
``jax.sharding.Mesh`` axis:

  * batch: sharded over the axis (data parallelism, sync — the
    CollectiveStrategy capability);
  * embedding tables: row-sharded by key hash (model parallelism of
    embeddings), lookups/grads exchanged with ``all_to_all`` over ICI
    (SOK's lookup_sparse data path);
  * dense params: replicated, gradients ``pmean``-ed (all-reduce).

Scales to multi-host by constructing the Mesh over all processes' devices
(jax.distributed) — the step body is identical.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deeprec_tpu.embedding import group as grp
from deeprec_tpu.embedding import lookup as lkp
from deeprec_tpu.embedding import table as ev
from deeprec_tpu.models import base
from deeprec_tpu.optimizers import sparse as sparse_opt
from deeprec_tpu.parallel import sharded as sh
from deeprec_tpu.train import metrics as M
from deeprec_tpu.train.loop import TrainState, _bce, make_features, model_loss


# ---------------------------------------------------------------------------
# Stacked (sharded) table helpers


STACKED_FIELDS = ("keys", "values", "slots", "freqs", "versions", "touched",
                  "cbf", "size", "growth_hint")


def stack_table(table: ev.EmbeddingTable, num_shards: int) -> ev.EmbeddingTable:
    """Give every per-shard state array a leading [S] dim (default_rows stays
    replicated — same deterministic init pool on every shard)."""

    def rep(x):
        return jnp.broadcast_to(x[None], (num_shards,) + x.shape).copy() if x is not None else None

    return table.replace(
        keys=rep(table.keys), values=rep(table.values),
        slots={k: rep(v) for k, v in table.slots.items()},
        freqs=rep(table.freqs), versions=rep(table.versions),
        touched=rep(table.touched), cbf=rep(table.cbf),
        size=rep(table.size), growth_hint=rep(table.growth_hint),
    )


def table_pspec(table: ev.EmbeddingTable, axis: str) -> ev.EmbeddingTable:
    """Matching PartitionSpec pytree: shard-state on ``axis``, init pool
    replicated."""

    sp = P(axis)
    return table.replace(
        keys=sp, values=sp, slots={k: sp for k in table.slots},
        freqs=sp if table.freqs is not None else None,
        versions=sp if table.versions is not None else None,
        touched=sp if table.touched is not None else None,
        cbf=sp if table.cbf is not None else None,
        size=sp, growth_hint=sp, default_rows=P(),
    )


def local_view(stacked: ev.EmbeddingTable) -> ev.EmbeddingTable:
    """Inside shard_map: strip the leading [1] shard dim."""

    def sq(x):
        return None if x is None else x[0]

    return stacked.replace(
        keys=sq(stacked.keys), values=sq(stacked.values),
        slots={k: sq(v) for k, v in stacked.slots.items()},
        freqs=sq(stacked.freqs), versions=sq(stacked.versions),
        touched=sq(stacked.touched), cbf=sq(stacked.cbf),
        size=sq(stacked.size), growth_hint=sq(stacked.growth_hint),
    )


def relift(local: ev.EmbeddingTable) -> ev.EmbeddingTable:
    def ex(x):
        return None if x is None else x[None]

    return local.replace(
        keys=ex(local.keys), values=ex(local.values),
        slots={k: ex(v) for k, v in local.slots.items()},
        freqs=ex(local.freqs), versions=ex(local.versions),
        touched=ex(local.touched), cbf=ex(local.cbf),
        size=ex(local.size), growth_hint=ex(local.growth_hint),
    )


def grow_stacked(stacked: ev.EmbeddingTable, new_capacity: int) -> ev.EmbeddingTable:
    """Rebuild every shard at a larger capacity (host-mediated growth)."""

    axes = stacked.replace(
        keys=0, values=0, slots={k: 0 for k in stacked.slots},
        freqs=0 if stacked.freqs is not None else None,
        versions=0 if stacked.versions is not None else None,
        touched=0 if stacked.touched is not None else None,
        cbf=0 if stacked.cbf is not None else None,
        size=0, growth_hint=0, default_rows=None,
    )
    fn = jax.vmap(lambda t: ev._rebuild(t, new_capacity), in_axes=(axes,),
                  out_axes=axes)
    return fn(stacked)


# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DistributedTrainer:
    """Sharded train/eval steps over a 1-D mesh axis."""

    model: base.RecModel
    mesh: Mesh
    sparse_optimizer: sparse_opt.SparseOptimizer
    dense_tx: optax.GradientTransformation
    axis: str = "data"
    bf16: bool = False
    use_counts: bool = False
    per_shard_capacity: Optional[int] = None
    table_option: Any = None
    # All-to-all bucket sizing (sharded.bucket_capacity): factor x the
    # balanced per-destination load.  Ids past the bucket get missing
    # semantics for that step; the overflow count is surfaced in the step
    # metrics as ``n_dropped`` and, when ``widen_on_drop`` is set, the
    # trainer doubles the factor and rebuilds the step so skewed key
    # distributions self-heal instead of silently losing features.
    bucket_factor: float = 2.0
    widen_on_drop: bool = True
    # How many steps of ``n_dropped`` scalars to batch before a host
    # readback (keeps the drop check off the async-dispatch critical path).
    drop_check_every: int = 16
    log_fn: Any = print
    # Multi-tier storage on the mesh: {physical table name: ShardedTiers}.
    # Cold rows are promoted per owner shard before each step; demotion
    # replaces growth at the HBM watermark (parallel/tiers.py).
    tiers: Any = None

    def __post_init__(self):
        for n, s in self.model.table_specs.items():
            if getattr(s, "variant", None) is not None:
                raise NotImplementedError(
                    f"table {n!r}: variant embeddings (multihash/dynamic_dim/"
                    "adaptive) are a single-chip Trainer feature; shard them "
                    "as regular tables or train on one chip")
        self.compute_dtype = jnp.bfloat16 if self.bf16 else jnp.float32
        self.plan = grp.plan_groups(self.model.table_specs)
        self.num_shards = self.mesh.shape[self.axis]
        self._train_step = None  # built lazily (needs state spec)
        self._pending_drops = []
        self.total_dropped = 0
        # serializes cold-store mutation (stager prepare vs demote re-sync)
        import threading

        self._tier_lock = threading.Lock()

    # -- state construction -------------------------------------------------

    def init_state(self, key) -> TrainState:
        from deeprec_tpu import config as cfg

        params = self.model.init_params(key)
        tables = {}
        for pname, pspec in self.plan.physical.items():
            cap = self.per_shard_capacity or max(
                1024, pspec.initial_capacity // self.num_shards)
            opt = self.table_option or cfg.EmbeddingVariableOption()
            opt = dataclasses.replace(opt, initial_capacity=cap)
            t = ev.create(pname, pspec.dim, option=opt)
            t = self.sparse_optimizer.init(t)
            tables[pname] = stack_table(t, self.num_shards)
        state = TrainState(
            params=params,
            opt_state=self.dense_tx.init(params),
            tables=tables,
            step=jnp.zeros((), jnp.int32),
            auc=M.AucState.create(),
        )
        return jax.device_put(state, self.state_sharding(state))

    def state_sharding(self, state: TrainState):
        mesh, axis = self.mesh, self.axis

        def ns(spec):
            return NamedSharding(mesh, spec)

        return TrainState(
            params=jax.tree.map(lambda _: ns(P()), state.params),
            opt_state=jax.tree.map(lambda _: ns(P()), state.opt_state),
            tables={
                n: jax.tree.map(lambda sp: ns(sp),
                                table_pspec(t, axis),
                                is_leaf=lambda x: isinstance(x, P))
                for n, t in state.tables.items()
            },
            step=ns(P()),
            auc=jax.tree.map(lambda _: ns(P()), state.auc),
        )

    def state_pspec(self, state: TrainState):
        return TrainState(
            params=jax.tree.map(lambda _: P(), state.params),
            opt_state=jax.tree.map(lambda _: P(), state.opt_state),
            tables={n: table_pspec(t, self.axis) for n, t in state.tables.items()},
            step=P(),
            auc=jax.tree.map(lambda _: P(), state.auc),
        )

    # -- step body (runs per device inside shard_map) ----------------------

    def _body(self, state: TrainState, batch: Dict, train: bool):
        model = self.model
        axis = self.axis
        features = make_features(model, batch)
        tables = {n: local_view(t) for n, t in state.tables.items()}

        # grouped sharded lookup: one all_to_all pair per physical table
        ctxs, looked, handles = {}, {}, {}
        for pname, pspec in self.plan.physical.items():
            parts, off = [], 0
            grouped = len(pspec.members) > 1
            empty = tables[pname].empty
            for lname, fidx in pspec.members:
                fnames = [lname] + [
                    f"{lname}:{x}"
                    for x in model.table_specs[lname].shared_features
                ]
                for fname in fnames:
                    ids2 = lkp._ids2d(features[fname].ids)
                    n = ids2.shape[0] * ids2.shape[1]
                    gk = grp.group_key(ids2.reshape(-1),
                                       fidx if grouped else None,
                                       pspec.id_bits, empty)
                    parts.append(gk)
                    handles[fname] = (pname, (off, n))
                    off += n
            flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
            tbl, rows, ctx = sh.sharded_lookup(
                tables[pname], flat, axis, step=state.step, train=train,
                bucket_factor=self.bucket_factor)
            tables[pname] = tbl
            ctxs[pname] = ctx
            looked[pname] = rows          # [N_flat, D] per-position rows
        n_dropped = sum(ctx.n_dropped for ctx in ctxs.values())

        def loss_fn(params, looked):
            acts = {}
            for fname, feat in features.items():
                lname = fname.split(":")[0]
                spec = model.table_specs[lname]
                pname, (off, n) = handles[fname]
                rows = lax.dynamic_slice_in_dim(looked[pname], off, n)
                rows = rows.astype(self.compute_dtype)
                ident = jnp.arange(n, dtype=jnp.int32)
                empty = tables[pname].empty
                if feat.ids.ndim >= 2:
                    acts[fname] = lkp.sequence_embedding(rows, ident, feat, empty)
                else:
                    acts[fname] = lkp.combine(rows, ident, feat, empty,
                                              spec.combiner)
            dense_in = dict(batch)
            dense_in["dense"] = batch["dense"].astype(self.compute_dtype)
            logits = model.forward(params, dense_in, acts, train)
            loss, plogits, plabels = model_loss(model, logits, batch)
            return loss, (plogits, plabels)

        if not train:
            loss, (logits, _) = loss_fn(state.params, looked)
            return logits, lax.pmean(loss, axis)

        (loss, (logits, plabels)), (gp, gl) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, looked)

        # dense: sync data-parallel all-reduce
        gp = jax.tree.map(lambda g: lax.pmean(g, axis), gp)
        updates, opt_state = self.dense_tx.update(gp, state.opt_state,
                                                  state.params)
        params = optax.apply_updates(state.params, updates)

        # sparse: reverse all_to_all to owner shards
        for pname, g in gl.items():
            tables[pname] = sh.sharded_apply(
                tables[pname], ctxs[pname], g, self.sparse_optimizer, axis,
                step=state.step, use_counts=self.use_counts,
                bucket_factor=self.bucket_factor)

        # replicated streaming AUC: accumulate global deltas
        delta = M.auc_update(M.AucState.create(), logits, plabels)
        auc = M.AucState(
            tp=state.auc.tp + lax.psum(delta.tp, axis),
            fp=state.auc.fp + lax.psum(delta.fp, axis),
            n_pos=state.auc.n_pos + lax.psum(delta.n_pos, axis),
            n_neg=state.auc.n_neg + lax.psum(delta.n_neg, axis),
        )
        new_state = state.replace(
            params=params, opt_state=opt_state,
            tables={n: relift(t) for n, t in tables.items()},
            step=state.step + 1, auc=auc,
        )
        metrics = {"loss": lax.pmean(loss, axis),
                   "n_dropped": lax.psum(n_dropped, axis)}
        return new_state, metrics

    # -- public API ---------------------------------------------------------

    def _build_steps(self, state: TrainState, batch: Dict):
        sspec = self.state_pspec(state)
        bspec = jax.tree.map(lambda _: P(self.axis), batch)

        def train_body(s, b):
            return self._body(s, b, True)

        def eval_body(s, b):
            return self._body(s, b, False)

        smap_train = jax.shard_map(
            train_body, mesh=self.mesh, in_specs=(sspec, bspec),
            out_specs=(sspec, {"loss": P(), "n_dropped": P()}),
            check_vma=False)
        smap_eval = jax.shard_map(
            eval_body, mesh=self.mesh, in_specs=(sspec, bspec),
            out_specs=(P(self.axis), P()), check_vma=False)
        self._train_step = jax.jit(smap_train, donate_argnums=(0,))
        self._eval_step = jax.jit(smap_eval)

    def train_step(self, state: TrainState, batch: Dict, payloads=None):
        if self.tiers:
            if payloads is None:
                payloads = [p] if (p := self.prepare_payloads(batch)) else []
            state = self._apply_payloads(state, payloads)
        batch = self._shard_batch(batch)
        if self._train_step is None:
            self._build_steps(state, batch)
        state, metrics = self._train_step(state, batch)
        if self.widen_on_drop:
            self._check_drops(metrics["n_dropped"])
        return state, metrics

    def prepare_payloads(self, batch: Dict, erase: bool = True) -> Dict:
        """Cold-store lookups routed per owner shard: {pname: payload}.
        TierStager-compatible (same surface as Trainer.prepare_payloads)."""

        return self._prepare_payloads_impl(batch, erase)

    def _prepare_payloads_impl(self, batch: Dict, erase: bool) -> Dict:
        from deeprec_tpu.train.loop import host_group_keys

        any_tier = next(iter(self.tiers.values()))
        empty = int(jnp.iinfo(any_tier.key_np).min)
        gk = host_group_keys(self.model, self.plan, batch, empty)
        out = {}
        for pname, tier in self.tiers.items():
            payload = tier.prepare(gk[pname], empty, erase=erase)
            if payload is not None:
                out[pname] = payload
        return out

    def _apply_payloads(self, state: TrainState, payloads) -> TrainState:
        if not payloads:
            return state
        tables = dict(state.tables)
        for pl in payloads:
            for pname, payload in pl.items():
                tables[pname] = self.tiers[pname].promote(tables[pname],
                                                          payload)
        return state.replace(tables=tables)

    def _promote_for_batch(self, state: TrainState, batch: Dict,
                           erase: bool = True) -> TrainState:
        """Inline promotion (eval read-through uses erase=False)."""

        p = self._prepare_payloads_impl(batch, erase)
        return self._apply_payloads(state, [p] if p else [])

    def _check_drops(self, n_dropped):
        """Batch ``drop_check_every`` per-step drop counters before a host
        readback; on any overflow, double the bucket factor and rebuild the
        step (the all-to-all analogue of EV capacity growth)."""

        self._pending_drops.append(n_dropped)
        if len(self._pending_drops) < self.drop_check_every:
            return
        drops = int(sum(int(np.asarray(jax.device_get(d)))
                        for d in self._pending_drops))
        self._pending_drops = []
        if drops == 0:
            return
        self.total_dropped += drops
        self.bucket_factor *= 2.0
        self._train_step = None  # rebuild with wider buckets
        self.log_fn(
            f"[deeprec_tpu] sharded exchange overflowed: {drops} ids got "
            f"missing semantics; widening bucket_factor to "
            f"{self.bucket_factor:g} and recompiling the step")

    def eval_step(self, state: TrainState, batch: Dict):
        if self.tiers:
            # read-through: transient copy-promotion, cold stores unchanged
            state = self._promote_for_batch(state, batch, erase=False)
        batch = self._shard_batch(batch)
        if self._train_step is None:
            self._build_steps(state, batch)
        return self._eval_step(state, batch)

    def _shard_batch(self, batch):
        sharding = jax.tree.map(
            lambda _: NamedSharding(self.mesh, P(self.axis)), batch)
        return jax.device_put(batch, sharding)

    def maybe_grow(self, state: TrainState, stager=None) -> TrainState:
        tables = dict(state.tables)
        changed = False
        with self._tier_lock:
            for n, t in tables.items():
                if self.tiers and n in self.tiers:
                    # HBM budget fixed: demote cold rows per shard instead
                    if self.tiers[n].needs_demote(t):
                        tables[n] = self.tiers[n].demote(t)
                        changed = True
                    continue
                cap = t.keys.shape[1]
                max_size = int(np.max(jax.device_get(t.size)))
                hint = int(np.max(jax.device_get(t.growth_hint)))
                if max_size > t.option.max_load_factor * cap or hint > 0:
                    tables[n] = grow_stacked(t, cap * 2)
                    changed = True
            if changed and stager is not None:
                stager.resync_locked()
        return state.replace(tables=tables) if changed else state
