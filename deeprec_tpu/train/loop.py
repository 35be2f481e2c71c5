"""Training loop: jitted step orchestration over tables + dense params.

The functional replacement for the reference's MonitoredTrainingSession loop
(modelzoo/wide_and_deep/train.py:534-588): one jitted ``train_step`` performs
  grouped lookup-phase → value-and-grad over (dense params, gathered rows)
  → dense optax update + sparse table update,
and the host loop handles the things XLA can't: dynamic table growth
(capacity doubling, EV dynamic-shape semantics), checkpoint cadence, logging.

All embedding traffic flows through the group plan
(deeprec_tpu/embedding/group.py): logical tables stacked into few physical
tables → one lookup-or-insert + one sparse-apply subgraph per group instead of
per feature (the GroupEmbedding capability, and the reason compile time and
step time stay flat as models add features).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from deeprec_tpu.embedding import group as grp
from deeprec_tpu.embedding import lookup as lkp
from deeprec_tpu.embedding import table as ev
from deeprec_tpu.models import base
from deeprec_tpu.optimizers import sparse as sparse_opt
from deeprec_tpu.train import metrics as M


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    tables: Dict[str, ev.EmbeddingTable]
    step: jnp.ndarray
    auc: M.AucState
    # Delayed-gradient FIFO (Trainer(staleness=k)): {physical table:
    # ((Lookup, grad), ... k entries)}, oldest first.  None when staleness=0
    # or before the first step primes it.
    pending: Any = None


def _bce(logits, labels):
    return jnp.mean(optax.sigmoid_binary_cross_entropy(
        logits.astype(jnp.float32), labels))


def model_loss(model: base.RecModel, logits, batch):
    """Single-task BCE, or summed per-task BCE for multi-task models.

    Returns (loss, primary_logits, primary_labels) — primary = first task,
    used for the streaming AUC (the modelzoo convention of reporting the
    main task's AUC).
    """

    if not model.tasks:
        return _bce(logits, batch["label"]), logits, batch["label"]
    loss = 0.0
    for t in model.tasks:
        loss = loss + _bce(logits[t], batch["labels"][t])
    t0 = model.tasks[0]
    return loss, logits[t0], batch["labels"][t0]


def make_features(model: base.RecModel, batch: Dict) -> Dict[str, lkp.SparseFeature]:
    """Logical feature name -> SparseFeature, including shared-table extras.

    Feature-column transforms (crossed/bucketized/weighted — TableSpec
    cross/bucket_boundaries/weight_feature) resolve here on the device
    path; models/columns.py keeps the host prefetch twin bit-identical."""

    from deeprec_tpu.models import columns

    feats = {}
    for name, spec in model.table_specs.items():
        feats[name] = lkp.SparseFeature(
            ids=columns.feature_ids(spec, None, batch, jnp),
            weights=columns.feature_weights(spec, batch))
        for extra in spec.shared_features:
            feats[f"{name}:{extra}"] = lkp.SparseFeature(ids=batch["cat"][extra])
    return feats


def host_group_keys(model: base.RecModel, plan, batch: Dict,
                    empty: int) -> Dict[str, "np.ndarray"]:
    """Host-side (numpy) replica of the grouped key composition — used by the
    tiered-storage prefetch to know the step's physical keys in advance."""

    import numpy as np

    out = {}
    for pname, pspec in plan.physical.items():
        parts = []
        grouped = len(pspec.members) > 1
        for lname, fidx in pspec.members:
            spec = model.table_specs[lname]
            cols = [None] + list(spec.shared_features)
            for col in cols:
                from deeprec_tpu.models import columns

                ids = np.asarray(
                    columns.feature_ids(spec, col, batch, np)).reshape(-1)
                if grouped:
                    mask = (1 << pspec.id_bits) - 1
                    composed = ((ids & mask)
                                | np.asarray(fidx << pspec.id_bits, ids.dtype))
                    ids = np.where(ids == empty, ids, composed)
                parts.append(ids)
        out[pname] = np.concatenate(parts) if len(parts) > 1 else parts[0]
    return out


def init_variant_params(model: base.RecModel, key):
    """Dense parameter state for variant tables (multihash component
    tables / adaptive static tables) — lives in params["_variants"] and
    trains through ``dense_tx`` (the reference keeps these as regular
    Variables: MultiHashVariable kv_variable_ops.py:986,
    adaptive_embedding_lookup_sparse embedding_ops.py:667).  Shared by the
    single-chip Trainer and the DistributedTrainer (variant params are
    replicated on a mesh — multihash Q-R components and adaptive static
    tables are dense, so data-parallel pmean is their natural sharding)."""

    import zlib

    out = {}
    for name, spec in model.table_specs.items():
        v = getattr(spec, "variant", None)
        if v not in ("multihash", "adaptive"):
            continue
        k = jax.random.fold_in(key, zlib.crc32(name.encode()) & 0x7FFFFFFF)
        if v == "multihash":
            nparts = len(spec.multihash_buckets)
            d = (spec.dim // nparts if spec.multihash_op == "concat"
                 else spec.dim)
            ks = jax.random.split(k, nparts)
            out[name] = tuple(
                jax.random.normal(kk, (b, d), jnp.float32) * 0.05
                for kk, b in zip(ks, spec.multihash_buckets))
        else:
            out[name] = jax.random.normal(
                k, (spec.adaptive_buckets, spec.dim), jnp.float32) * 0.05
    return out


def adaptive_migrate(spec, tbl, lk, flat_ids, static):
    """Adaptive-embedding migration (the reference's ``ev_init_value``,
    embedding_ops.py:667): the step an id's frequency crosses
    ``adaptive_threshold`` its EV row is seeded from the static
    hash-bucket row it trained while cold, so the learned representation
    carries over instead of restarting from a fresh init.  Runs wherever
    the table lives — single-chip, or owner-side inside shard_map."""

    from deeprec_tpu.ops import hashing

    th = spec.adaptive_threshold
    cap = tbl.capacity
    safe = jnp.where(lk.slot_ids < cap, lk.slot_ids, jnp.int32(cap))
    f_after = tbl.freqs.at[safe].get(mode="fill", fill_value=0)
    # per-slot total count contributed by THIS batch -> pre-batch freq
    # (reuse the lookup phase's folded count plane when present — the
    # masks coincide: valid & slot<cap == found)
    if lk.slot_counts is not None and lk.slot_counts.shape[0] == cap:
        this_batch = lk.slot_counts.at[safe].get(mode="fill", fill_value=0)
    else:
        cbuf = jnp.zeros((cap + 1,), jnp.int32).at[safe].add(
            jnp.where(lk.valid, lk.counts, 0), mode="drop")
        this_batch = cbuf[safe]
    f_before = f_after - this_batch
    crossed = lk.valid & (lk.slot_ids < cap) \
        & (f_after >= th) & (f_before < th)

    emp = tbl.empty

    def migrated_rows(comp):
        cids = flat_ids.at[comp].get(mode="fill", fill_value=emp)
        bkt = hashing.bucket(cids, static.shape[0], salt=3)
        return jax.lax.stop_gradient(
            static[bkt].astype(tbl.value_dtype))

    # zero-cost when no id crosses the threshold this step (a lax.cond
    # gate would copy the whole values array — see chunked_masked_row_set)
    values = ev.chunked_masked_row_set(
        tbl.values, crossed, lk.slot_ids, migrated_rows)
    return tbl.replace(values=values)


@dataclasses.dataclass
class Trainer:
    """Builds and runs jitted train/eval steps for one RecModel."""

    model: base.RecModel
    tables: Dict[str, ev.EmbeddingTable]
    sparse_optimizer: sparse_opt.SparseOptimizer
    dense_tx: optax.GradientTransformation
    bf16: bool = False
    use_counts: bool = False
    # Multi-tier storage: {physical table name: TieredTable}.  When set, the
    # host loop promotes cold rows before each step and demotes instead of
    # growing at the HBM budget (embedding/tiered.py).
    tiers: Any = None
    # MicroBatch (graph_execution_state.cc:635-727, micro_batch_num
    # config.proto:324): the step body is duplicated over N micro-slices of
    # the batch; dense gradients are accumulated and applied once, halving
    # peak activation memory per doubling.  Sparse applies run per
    # micro-batch (async-PS-equivalent semantics).
    micro_batch_num: int = 1
    # Bounded-staleness delayed-gradient mode (the async-PS / async-embedding
    # -stage capability, config.proto:328; modelzoo train.py:920-936 default
    # async mode): sparse gradients computed at step t are applied at step
    # t+k via a device-resident FIFO in TrainState.pending.  This breaks the
    # lookup -> grad -> apply serial chain within a step, letting XLA overlap
    # the (stale) table update with the next forward — the same
    # throughput-for-staleness trade the reference makes, with staleness
    # bounded at exactly k steps instead of unbounded.  Dense params stay
    # synchronous.  Growth/demotion events drop the in-flight window (<= k
    # steps of sparse grads), mirroring async-PS update loss on repartition.
    staleness: int = 0
    # Sparse-apply strategy override (None = shape dispatch; "dense" /
    # "compact" force one path — see optimizers/sparse._pick_strategy).
    apply_strategy: Any = None
    # Per-device HBM budget in bytes (None = unchecked).  The two known
    # memory cliffs fail FAST with a clear error instead of an OOM
    # mid-job: the 2x-growth rebuild peak (old + new resident — see the
    # growth-memory note in embedding/table.py) and the staleness FIFO
    # (utils/budget.py; round-5 verdict #8).
    budget_bytes: Any = None

    def __post_init__(self):
        if self.staleness and self.micro_batch_num > 1:
            raise ValueError("staleness and micro_batch_num>1 are exclusive")
        self.compute_dtype = jnp.bfloat16 if self.bf16 else jnp.float32
        self.plan = grp.plan_groups(self.model.table_specs)
        # feature name -> logical table name (strip ":extra" suffix)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)
        # serializes cold-store mutation (stager prepare vs demote re-sync)
        import threading

        self._tier_lock = threading.Lock()

    def init_state(self, key) -> TrainState:
        params = self.model.init_params(key)
        vparams = self._init_variants(key)
        if vparams:
            params = dict(params)
            params["_variants"] = vparams
        tables = {n: self.sparse_optimizer.init(t) for n, t in self.tables.items()}
        return TrainState(
            params=params,
            opt_state=self.dense_tx.init(params),
            tables=tables,
            step=jnp.zeros((), jnp.int32),
            auc=M.AucState.create(),
        )

    def _init_variants(self, key):
        return init_variant_params(self.model, key)

    # -- grouped lookup plumbing -------------------------------------------

    def _grouped_lookup(self, tables, features, step, train, params=None):
        """One lookup-or-insert per physical table; returns per-feature
        (physical name, inverse-slice) handles for combine."""

        plan = self.plan
        new_tables = dict(tables)
        lks: Dict[str, ev.Lookup] = {}
        gathered: Dict[str, jnp.ndarray] = {}
        handles: Dict[str, Tuple[str, Tuple[int, int]]] = {}
        for pname, pspec in plan.physical.items():
            parts = []
            off = 0
            grouped = len(pspec.members) > 1
            empty = new_tables[pname].empty
            for lname, fidx in pspec.members:
                fnames = [lname] + [
                    f"{lname}:{x}"
                    for x in self.model.table_specs[lname].shared_features
                ]
                for fname in fnames:
                    ids2 = lkp._ids2d(features[fname].ids)
                    n = ids2.shape[0] * ids2.shape[1]
                    gk = grp.group_key(
                        ids2.reshape(-1), fidx if grouped else None,
                        pspec.id_bits, empty,
                    )
                    parts.append(gk)
                    handles[fname] = (pname, (off, n))
                    off += n
            flat = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
            tbl, lk = ev.lookup_phase(new_tables[pname], flat, step=step,
                                      train=train)
            if train and not grouped and params is not None:
                spec0 = self.model.table_specs[pspec.members[0][0]]
                if getattr(spec0, "variant", None) == "adaptive":
                    tbl = self._adaptive_migrate(spec0, tbl, lk, flat, params,
                                                 pspec.members[0][0])
            new_tables[pname] = tbl
            lks[pname] = lk
            gathered[pname] = ev.collect(tbl, lk)
        return new_tables, lks, gathered, handles

    def _adaptive_migrate(self, spec, tbl, lk, flat_ids, params, lname):
        return adaptive_migrate(spec, tbl, lk, flat_ids,
                                params["_variants"][lname])

    def _make_acts(self, gathered, lks, handles, features, tables,
                   params=None):
        """2-D id features ([B, L]) yield sequence acts (emb [B,L,D], mask);
        1-D features yield combined [B, D] activations.  Variant tables
        (TableSpec.variant) take their dedicated row paths here."""

        acts = {}
        for fname, feat in features.items():
            lname = fname.split(":")[0]
            spec = self.model.table_specs[lname]
            variant = getattr(spec, "variant", None)
            if variant == "multihash":
                from deeprec_tpu.embedding import variants as vr

                ids_flat = lkp._ids2d(feat.ids).reshape(-1)
                rows = vr.multihash_lookup(
                    params["_variants"][lname], ids_flat,
                    operation=spec.multihash_op)
                empty = ev.empty_key(feat.ids.dtype)
            else:
                pname, (off, n) = handles[fname]
                # rows are per-position (engine v2): this feature's rows are
                # a contiguous slice of the group's gathered block
                rows = jax.lax.dynamic_slice_in_dim(gathered[pname], off, n)
                empty = tables[pname].empty
                if variant in ("dynamic_dim", "adaptive"):
                    t = tables[pname]
                    sl = jax.lax.dynamic_slice_in_dim(lks[pname].slot_ids,
                                                      off, n)
                    safe = jnp.where(sl < t.capacity, sl,
                                     jnp.int32(t.capacity))
                    freq = t.freqs.at[safe].get(mode="fill", fill_value=0)
                if variant == "dynamic_dim":
                    # frequency-adaptive dims: id i keeps its first
                    # (1 + #thresholds crossed) blocks, tail zeroed
                    bn = jnp.ones_like(freq)
                    for th in spec.dyn_dim_thresholds:
                        bn = bn + (freq >= th).astype(bn.dtype)
                    nblocks = t.dim // spec.dyn_dim_block
                    blk = jax.lax.broadcasted_iota(jnp.int32, (n, nblocks), 1)
                    mask = (blk < bn[:, None]).astype(rows.dtype)
                    rows = rows * jnp.repeat(mask, spec.dyn_dim_block, axis=1)
                elif variant == "adaptive":
                    # hot ids read/train the EV row; cold ids a hash-bucket
                    # dense row (collisions acceptable at low freq)
                    from deeprec_tpu.ops import hashing

                    static = params["_variants"][lname]
                    ids_flat = lkp._ids2d(feat.ids).reshape(-1)
                    bkt = hashing.bucket(ids_flat, static.shape[0], salt=3)
                    hot = freq >= spec.adaptive_threshold
                    rows = jnp.where(hot[:, None], rows,
                                     static[bkt].astype(rows.dtype))
            rows = rows.astype(self.compute_dtype)
            if feat.ids.ndim >= 2 and not spec.multivalent:
                acts[fname] = lkp.sequence_embedding(rows, None, feat, empty)
            else:
                acts[fname] = lkp.combine(rows, None, feat, empty,
                                          spec.combiner)
        return acts

    # -- jitted bodies ------------------------------------------------------

    def _train_step_impl(self, state: TrainState, batch: Dict):
        if self.micro_batch_num > 1:
            return self._micro_batch_step(state, batch)
        model = self.model
        features = make_features(model, batch)
        tables, lks, gathered, handles = self._grouped_lookup(
            state.tables, features, state.step, True, params=state.params
        )

        def loss_fn(params, gathered):
            acts = self._make_acts(gathered, lks, handles, features, tables,
                                   params)
            dense_in = dict(batch)
            dense_in["dense"] = batch["dense"].astype(self.compute_dtype)
            logits = model.forward(params, dense_in, acts, True)
            loss, plogits, plabels = model_loss(model, logits, batch)
            return loss, (plogits, plabels)

        (loss, (logits, plabels)), (gp, gg) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, gathered)

        updates, opt_state = self.dense_tx.update(gp, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        pending = state.pending
        if self.staleness > 0:
            # delayed apply: push (lk_t, g_t), pop and apply (lk_{t-k}, g_{t-k})
            pending = dict(pending)
            for pname, g in gg.items():
                g = self._grad_for_apply(g)
                fifo = pending[pname]
                old_lk, old_g = fifo[0]
                # Buffer batch-proportional state only: drop the [C]
                # slot_counts plane (it would make the FIFO scale with
                # table capacity — round-5 verdict); the delayed apply
                # recomputes it from (slot_ids, counts) via the sparse.py
                # scatter fallback, bit-identically.
                pending[pname] = tuple(fifo[1:]) + (
                    (lks[pname].replace(slot_counts=None), g),)
                tables[pname] = self.sparse_optimizer.apply(
                    tables[pname], old_lk, old_g,
                    step=state.step, use_counts=self.use_counts,
                    strategy=self.apply_strategy,
                )
        else:
            for pname, g in gg.items():
                tables[pname] = self.sparse_optimizer.apply(
                    tables[pname], lks[pname], self._grad_for_apply(g),
                    step=state.step, use_counts=self.use_counts,
                    strategy=self.apply_strategy,
                )
        auc = M.auc_update(state.auc, logits, plabels)
        new_state = state.replace(
            params=params, opt_state=opt_state, tables=tables,
            step=state.step + 1, auc=auc, pending=pending,
        )
        return new_state, {"loss": loss}

    def _grad_for_apply(self, g):
        """Gradient dtype at the sparse apply.  Downcasting bf16-compute
        cotangents here is LOSSLESS (they are exact upcasts of bf16
        values) and segment_scatter can carry bf16 natively — but the
        native path measured 2-3% SLOWER in-step (the grad permute is
        row-issue-bound; benchmarks/bf16grad_ab.py, PERF.md rejected
        optimizations), so the default stays f32 pass-through."""

        return g

    def _zero_pending(self, batch: Dict, tables):
        """Build the staleness FIFO primed with no-op entries (valid=False
        everywhere -> the masked apply touches nothing) whose shapes match
        what ``_grouped_lookup`` will produce for batches shaped like
        ``batch``."""

        import numpy as np

        from deeprec_tpu.models import columns

        ns = {}
        for pname, pspec in self.plan.physical.items():
            n = 0
            for lname, _ in pspec.members:
                spec = self.model.table_specs[lname]
                shape = columns.feature_shape(spec, batch)
                n += int(np.prod(shape)) if shape else 1
                for col in spec.shared_features:
                    shape = np.shape(batch["cat"][col])
                    n += int(np.prod(shape)) if shape else 1
            ns[pname] = n
        if self.budget_bytes:
            # fail BEFORE allocating: k x per-table exchange state
            from deeprec_tpu.utils import budget

            fifo = self.staleness * sum(
                budget.fifo_entry_bytes(tables[p], n)
                for p, n in ns.items())
            budget.check_staleness_fifo(tables, fifo, self.staleness,
                                        self.budget_bytes)
        pending = {}
        for pname, n in ns.items():
            # dtypes/dims from the LIVE tables (construction-time
            # self.tables may predate growth)
            t = tables[pname]

            def entry():  # distinct buffers per FIFO slot (state is donated)
                lk = ev.Lookup(
                    uids=jnp.full((n,), t.empty, t.key_dtype),
                    counts=jnp.zeros((n,), jnp.int32),
                    inverse=jnp.arange(n, dtype=jnp.int32),
                    slot_ids=jnp.full((n,), jnp.iinfo(jnp.int32).max,
                                      jnp.int32),
                    admitted=jnp.zeros((n,), bool),
                    valid=jnp.zeros((n,), bool),
                    # no [C] count plane in the FIFO (capacity-proportional
                    # memory; round-5 verdict) — the push side strips it
                    # and the delayed apply recomputes it
                    slot_counts=None,
                )
                return lk, jnp.zeros((n, t.dim), t.value_dtype)

            pending[pname] = tuple(entry() for _ in range(self.staleness))
        return pending

    def _micro_batch_step(self, state: TrainState, batch: Dict):
        m = self.micro_batch_num
        model = self.model
        n = batch["dense"].shape[0]
        assert n % m == 0, f"batch {n} not divisible by micro_batch_num {m}"
        sz = n // m
        tables = state.tables
        dense_acc = jax.tree.map(jnp.zeros_like, state.params)
        loss_acc = jnp.zeros((), jnp.float32)
        auc = state.auc
        for i in range(m):
            mb = jax.tree.map(lambda x: x[i * sz:(i + 1) * sz], batch)
            features = make_features(model, mb)
            tables, lks, gathered, handles = self._grouped_lookup(
                tables, features, state.step, True, params=state.params)

            def loss_fn(params, gathered, mb=mb, lks=lks, handles=handles,
                        features=features, tables=tables):
                acts = self._make_acts(gathered, lks, handles, features,
                                       tables, params)
                dense_in = dict(mb)
                dense_in["dense"] = mb["dense"].astype(self.compute_dtype)
                logits = model.forward(params, dense_in, acts, True)
                loss, plogits, plabels = model_loss(model, logits, mb)
                return loss, (plogits, plabels)

            (loss, (logits, plabels)), (gp, gg) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(state.params, gathered)
            dense_acc = jax.tree.map(jnp.add, dense_acc, gp)
            loss_acc = loss_acc + loss
            for pname, g in gg.items():
                tables[pname] = self.sparse_optimizer.apply(
                    tables[pname], lks[pname], self._grad_for_apply(g),
                    step=state.step, use_counts=self.use_counts,
                    strategy=self.apply_strategy)
            auc = M.auc_update(auc, logits, plabels)
        gp = jax.tree.map(lambda x: x / m, dense_acc)
        updates, opt_state = self.dense_tx.update(gp, state.opt_state,
                                                  state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state, tables=tables,
            step=state.step + 1, auc=auc)
        return new_state, {"loss": loss_acc / m}

    def make_multi_step(self, k: int):
        """Compile a fused K-step trainer: ``fn(state, stacked_batch)`` runs
        K training steps in ONE dispatch via ``lax.scan`` and returns
        ``(state, losses[K])``.

        Per-step dispatch through the runtime costs ~100+ us of host work —
        ~7x the 2048-batch device step itself (benchmarks/dispatch_probe.py:
        156 us/step dispatched vs 19 us/step fused on v5e).  Production
        loops should dispatch in K-step chunks whenever per-step host
        interaction (tier promotion, per-step hooks) isn't needed; growth
        checks still run between chunks.  ``stacked_batch`` leaves carry a
        leading [K] axis (stack K batches).
        """

        def scan_body(state, batch):
            state, m = self._train_step_impl(state, batch)
            return state, m["loss"]

        def multi(state, stacked):
            return jax.lax.scan(scan_body, state, stacked)

        return jax.jit(multi, donate_argnums=(0,))

    def _eval_step_impl(self, state: TrainState, batch: Dict):
        model = self.model
        features = make_features(model, batch)
        _, lks, gathered, handles = self._grouped_lookup(
            state.tables, features, state.step, False
        )
        acts = self._make_acts(gathered, lks, handles, features,
                               state.tables, state.params)
        dense_in = dict(batch)
        dense_in["dense"] = batch["dense"].astype(self.compute_dtype)
        logits = model.forward(state.params, dense_in, acts, False)
        loss, plogits, plabels = model_loss(model, logits, batch)
        return plogits, loss

    # -- host API -----------------------------------------------------------

    def train_step(self, state: TrainState, batch: Dict, payloads=None):
        """One training step.  ``payloads`` (from a TierStager) carries
        pre-computed tier promotions; without it the promotion work runs
        inline on the calling thread."""

        if self.staleness and state.pending is None:
            state = state.replace(
                pending=self._zero_pending(batch, state.tables))
        if self.tiers:
            if payloads is None:
                payloads = [p] if (p := self.prepare_payloads(batch)) else []
            state = self._apply_payloads(state, payloads)
        return self._train_step(state, batch)

    def prepare_payloads(self, batch: Dict, erase: bool = True) -> Dict:
        """Cold-store lookups for this batch's ids: {pname: payload}.
        Thread-safe vs the training step (touches only the host KVs); this
        is the work the TierStager moves off the critical path."""

        empty = next(iter(self.tables.values())).empty
        gk = host_group_keys(self.model, self.plan, batch, empty)
        out = {}
        for pname, tier in self.tiers.items():
            payload = tier.prepare(gk[pname], empty, erase=erase)
            if payload is not None:
                out[pname] = payload
        return out

    def _apply_payloads(self, state: TrainState, payloads) -> TrainState:
        """Bulk-upsert prepared promotion payloads into the device tables."""

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

        p = self.prepare_payloads(batch, erase=erase)
        return self._apply_payloads(state, [p] if p else [])

    def eval_step(self, state: TrainState, batch: Dict):
        if self.tiers:
            # read-through: transient copy-promotion, cold store unchanged
            state = self._promote_for_batch(state, batch, erase=False)
        return self._eval_step(state, batch)

    def maybe_grow(self, state: TrainState, stager=None) -> TrainState:
        """Host-side dynamic growth check (between steps; triggers recompile
        only when a capacity actually doubles).  With tiers, demotion runs
        under the tier lock and re-syncs any staged payloads atomically."""

        tables = dict(state.tables)
        changed = False
        with self._tier_lock:
            for n, t in tables.items():
                if self.tiers and n in self.tiers:
                    # HBM budget is fixed: demote cold rows instead of
                    # growing.  Two-phase by default (begin: async victim
                    # export overlaps the next steps; finish: cheap commit) —
                    # synchronous only under insert-overflow pressure, where
                    # waiting a grow_every window would drop ids.
                    tier = self.tiers[n]
                    if tier.has_pending_demote:
                        tables[n] = tier.finish_demote(t)
                        changed = True
                    elif tier.needs_demote(t):
                        if int(jax.device_get(t.growth_hint)) > 0:
                            tables[n] = tier.demote(t)
                            changed = True
                        else:
                            tier.begin_demote(t)
                elif ev.needs_grow(t):
                    # budget check per doubling: the rebuild peak holds
                    # old C + new 2C live (donation can't alias across
                    # the shape change).  extra covers the resident
                    # staleness FIFO and, on a multi-doubling loop, the
                    # intermediate copies still referenced by state
                    # (round-5 review).
                    fifo = 0
                    if self.budget_bytes:
                        from deeprec_tpu.utils import budget

                        fifo = budget.pending_bytes(state.pending)
                    while ev.needs_grow(t):
                        if self.budget_bytes:
                            # the LIVE resident set during this rebuild:
                            # all tables (incl. the original C, still
                            # referenced by state) + the CURRENT source t
                            # when it is an intermediate copy (prior
                            # intermediates were freed on rebind) + the
                            # FIFO (round-5 review: adding the previous,
                            # already-freed copy instead under-counted
                            # the true peak)
                            inter = (0 if t is tables[n]
                                     else budget.table_state_bytes(t))
                            budget.check_growth(tables, n, t.capacity * 2,
                                                self.budget_bytes,
                                                extra_bytes=fifo + inter)
                        t = ev.grow(t)
                    tables[n] = t
                    changed = True
            if changed and stager is not None:
                stager.resync_locked()
        if not changed:
            return state
        # capacity changes relocate slots — drop the in-flight grad window
        # (re-primed on the next step; bounded-staleness semantics allow it)
        return state.replace(tables=tables,
                             pending=None if self.staleness else state.pending)

    def fit(
        self,
        state: TrainState,
        data_iter,
        steps: int,
        *,
        grow_every: int = 50,
        log_every: int = 100,
        log_fn: Callable = print,
        hooks=(),
        steps_per_dispatch: int = 1,
        _end_hooks: bool = True,
    ) -> TrainState:
        if steps_per_dispatch > 1:
            if self.tiers:
                raise ValueError(
                    "steps_per_dispatch > 1 needs per-step host promotion "
                    "disabled — tiered tables promote between steps")
            return self._fit_fused(state, data_iter, steps,
                                   k=steps_per_dispatch,
                                   grow_every=grow_every,
                                   log_every=log_every, log_fn=log_fn,
                                   hooks=hooks, _end_hooks=_end_hooks)
        t0 = time.time()
        seen = 0
        # hooks see the GLOBAL step (state.step), not this fit()'s loop index —
        # checkpoint/delta numbering must be monotonic across fit calls.
        global_start = int(jax.device_get(state.step))
        stager = None
        if self.tiers:
            # stage promotion work for batch t+1 while step t executes
            from deeprec_tpu.train.stager import TierStager

            stager = TierStager(self, data_iter, max_steps=steps)
            stream = ((b, pl) for b, pl in stager)
            # auto-wire the stager into tier-aware checkpoint hooks:
            # queued payload rows are in neither the device table nor the
            # cold store, and a full save that misses them silently drops
            # trained embeddings (round-5 review;
            # CheckpointSaverHook._cold_snapshot)
            for h in hooks:
                if (getattr(h, "tiers", None)
                        and getattr(h, "stager", False) is None):
                    h.stager = stager
        else:
            stream = ((b, None) for b in data_iter)
        # bound BEFORE pulling: `enumerate + break` would consume (and
        # silently discard) one extra batch from a shared iterator per
        # fit() chunk (round-4 review)
        stream_it = iter(stream)
        for i in range(steps):
            try:
                batch, payloads = next(stream_it)
            except StopIteration:
                break
            state, m = self.train_step(state, batch, payloads=payloads)
            seen += len(_first_labels(batch))
            if grow_every and (i + 1) % grow_every == 0:
                state = self.maybe_grow(state, stager=stager)
            for h in hooks:
                state = h.after_step(state, m, global_start + i)
            if log_every and (i + 1) % log_every == 0:
                dt = time.time() - t0
                log_fn(
                    f"step {i+1}: loss={float(m['loss']):.4f} "
                    f"auc={M.auc_value(state.auc):.4f} "
                    f"ex/s={seen/dt:,.0f}"
                )
        if _end_hooks:
            for h in hooks:
                state = h.end(state)
        return state

    def _fit_fused(self, state: TrainState, data_iter, steps: int, *, k: int,
                   grow_every: int, log_every: int, log_fn: Callable,
                   hooks=(), _end_hooks: bool = True) -> TrainState:
        """K-steps-per-dispatch fit: stacks K batches and scans.  Hooks fire
        once per chunk (with the chunk's last step index and mean loss);
        growth checks run between chunks."""

        import numpy as np

        multi = self.make_multi_step(k)
        t0 = time.time()
        seen = 0
        done = 0
        global_start = int(jax.device_get(state.step))
        it = iter(data_iter)
        while done < steps:
            chunk = []
            try:
                for _ in range(min(k, steps - done)):
                    chunk.append(next(it))
            except StopIteration:
                pass
            if not chunk:
                break
            if self.staleness and state.pending is None:
                state = state.replace(
                    pending=self._zero_pending(chunk[0], state.tables))
            if len(chunk) < k:      # ragged tail: plain per-step path
                tail_losses = []
                for b in chunk:
                    state, m = self._train_step(state, b)
                    tail_losses.append(m["loss"])
                # keep EVERY tail step's loss — reporting only the last
                # one as the chunk mean mis-logs the final chunk's
                # metrics (round-5 review)
                losses = jnp.stack(tail_losses)
            else:
                stacked = jax.tree.map(lambda *xs: np.stack(xs), *chunk)
                state, losses = multi(state, stacked)
            done += len(chunk)
            seen += sum(len(_first_labels(b)) for b in chunk)
            if grow_every and (done // max(grow_every, 1)) != \
                    ((done - len(chunk)) // max(grow_every, 1)):
                state = self.maybe_grow(state)
            m = {"loss": jnp.mean(losses)}
            for h in hooks:
                state = h.after_step(state, m, global_start + done - 1)
            if log_every and (done // max(log_every, 1)) != \
                    ((done - len(chunk)) // max(log_every, 1)):
                dt = time.time() - t0
                log_fn(
                    f"step {done}: loss={float(m['loss']):.4f} "
                    f"auc={M.auc_value(state.auc):.4f} ex/s={seen/dt:,.0f}")
        if _end_hooks:
            for h in hooks:
                state = h.end(state)
        return state

    def evaluate(self, state: TrainState, data_iter, steps: int) -> Dict[str, float]:
        import numpy as np

        all_logits, all_labels, losses = [], [], []
        data_iter = iter(data_iter)
        for _ in range(steps):
            # bound BEFORE pulling — enumerate+break would consume (and
            # silently discard) one extra batch from a shared iterator
            # (round-5 review: fit/stager already fixed this pattern)
            try:
                batch = next(data_iter)
            except StopIteration:
                break
            logits, loss = self.eval_step(state, batch)
            lbl = (batch["labels"][self.model.tasks[0]]
                   if self.model.tasks else batch["label"])
            all_logits.append(np.asarray(logits))
            all_labels.append(np.asarray(lbl))
            losses.append(float(loss))
        from deeprec_tpu.data.synthetic import auc_numpy

        logits = np.concatenate(all_logits)
        labels = np.concatenate(all_labels)
        return {"auc": auc_numpy(logits, labels), "loss": float(np.mean(losses))}


def _first_labels(batch: Dict):
    """Per-example label array for throughput accounting — multi-task
    batches may carry only batch['labels'][task] (models/base.py:128)."""

    if "label" in batch:
        return batch["label"]
    labels = batch["labels"]
    return labels[next(iter(labels))]


def train_and_evaluate(
    trainer: Trainer,
    state: TrainState,
    train_iter,
    eval_iter_fn: Callable[[], Any],
    *,
    total_steps: int,
    eval_every: int = 1000,
    eval_steps: int = 50,
    hooks=(),
    log_fn: Callable = print,
) -> TrainState:
    """Estimator-style alternating train/evaluate driver
    (tf.estimator.train_and_evaluate role; the reference patches Estimator in
    a separate repo — here it is a 20-line convenience over Trainer)."""

    done = 0
    while done < total_steps:
        chunk = min(eval_every, total_steps - done)
        state = trainer.fit(state, train_iter, chunk, hooks=hooks,
                            log_every=0,
                            _end_hooks=done + chunk >= total_steps)
        done += chunk
        m = trainer.evaluate(state, eval_iter_fn(), eval_steps)
        log_fn(f"eval @ step {done}: auc={m['auc']:.4f} loss={m['loss']:.4f}")
    return state
