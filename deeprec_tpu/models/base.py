"""Model-zoo base: feature specs and the model interface.

Mirrors the reference modelzoo skeleton (modelzoo/<model>/train.py — argparse
flags → feature columns → model class → training loop) as a functional
interface:

  * ``TableSpec``     — one embedding table's config (a feature column).
  * ``RecModel``      — table specs + param init + pure forward.

Every model's ``forward(params, batch, acts, train)`` consumes the combined
embedding activations produced by ``deeprec_tpu.embedding.lookup`` and returns
logits [B] (multi-task models return dict of logits).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence

import jax.numpy as jnp

from deeprec_tpu import config as cfg
from deeprec_tpu.embedding import table as ev


@dataclasses.dataclass(frozen=True)
class TableSpec:
    """Embedding-table declaration (categorical_column_with_embedding)."""

    name: str
    dim: int
    combiner: cfg.Combiner = cfg.Combiner.MEAN
    sequence: bool = False          # sequence_categorical_column: no combine
    seq_len: int = 1
    initial_capacity: int = 2 ** 14
    shared_features: Sequence[str] = ()   # extra feature names using this table
    feature: Optional[str] = None   # batch column to read (defaults to name)
    # Group-embedding: tables with the same group name and dim share ONE
    # physical hash table (tf.nn.group_embedding_lookup capability; see
    # deeprec_tpu/embedding/group.py).  id_bits bounds each member's raw id
    # space (hash-bucket semantics).
    group: Optional[str] = None
    id_bits: int = 26
    # Variant embeddings, first-class (the reference's specialty variable
    # getters: get_multihash_variable variable_scope.py:2317,
    # get_dynamic_dimension_embedding_variable :2373,
    # categorical_column_with_adaptive_embedding feature_column_v2.py:2089):
    #   "multihash"   — Q-R compositional dense tables, no EV; component
    #                   tables live in params["_variants"] and train densely.
    #   "dynamic_dim" — EV whose per-id effective dim unlocks in blocks of
    #                   ``dyn_dim_block`` as frequency crosses
    #                   ``dyn_dim_thresholds``.
    #   "adaptive"    — hot ids (freq >= adaptive_threshold) read/train the
    #                   EV; cold ids fall back to a hash-bucket dense table
    #                   of ``adaptive_buckets`` rows in params["_variants"].
    variant: Optional[str] = None
    multihash_buckets: Sequence[int] = ()
    multihash_op: str = "add"            # add | mult | concat
    dyn_dim_block: int = 0
    dyn_dim_thresholds: Sequence[int] = ()
    adaptive_buckets: int = 0
    adaptive_threshold: int = 10
    # Feature-column transforms (tf.feature_column parity,
    # feature_column_v2.py: crossed_column / bucketized_column /
    # weighted_categorical_column).  Derived ids are computed identically
    # on device (jnp, inside the jitted step) and on host (np, for the
    # tiered-storage prefetch) — see models/columns.py.
    #   cross: >= 2 batch cat columns whose salted-hash combination feeds
    #     this table; ids land in [0, cross_buckets).
    #   numeric_feature + bucket_boundaries: bucketize column
    #     batch["dense"][:, numeric_feature] by the sorted boundaries;
    #     bucket index feeds this table (len(boundaries)+1 ids).
    #   weight_feature: per-id combiner weights read from
    #     batch["weights"][weight_feature] (sparse_weights semantics).
    cross: Sequence[str] = ()
    cross_buckets: int = 0
    numeric_feature: Optional[int] = None
    bucket_boundaries: Sequence[float] = ()
    weight_feature: Optional[str] = None
    # Multivalent (multi-hot) columns: [B, L] ids that COMBINE into one
    # [B, D] activation (embedding_column over a multivalent categorical —
    # EMPTY-padded, weights optional) instead of the default sequence
    # treatment of 2-D ids ([B, L, D] + mask).
    multivalent: bool = False

    def __post_init__(self):
        if self.cross and self.bucket_boundaries:
            raise ValueError(f"{self.name}: cross and bucket_boundaries are "
                             "exclusive")
        if self.cross and len(self.cross) < 2:
            raise ValueError(f"{self.name}: cross needs >= 2 source columns")
        if self.cross and self.cross_buckets <= 0:
            raise ValueError(f"{self.name}: cross needs cross_buckets > 0")
        if bool(self.bucket_boundaries) != (self.numeric_feature is not None):
            raise ValueError(f"{self.name}: bucketized columns need BOTH "
                             "numeric_feature and bucket_boundaries")
        if self.bucket_boundaries and list(self.bucket_boundaries) != sorted(
                self.bucket_boundaries):
            raise ValueError(f"{self.name}: bucket_boundaries must be sorted")
        v = self.variant
        if v is None:
            return
        if v not in ("multihash", "dynamic_dim", "adaptive"):
            raise ValueError(f"{self.name}: unknown variant {v!r}")
        if self.group is not None:
            raise ValueError(f"{self.name}: variant tables cannot be grouped")
        if v == "multihash":
            if len(self.multihash_buckets) < 2:
                raise ValueError(f"{self.name}: multihash needs >=2 buckets")
            if (self.multihash_op == "concat"
                    and self.dim % len(self.multihash_buckets)):
                raise ValueError(f"{self.name}: dim must divide evenly for "
                                 "concat multihash")
        if v == "dynamic_dim":
            if self.dyn_dim_block <= 0 or self.dim % self.dyn_dim_block:
                raise ValueError(f"{self.name}: dyn_dim_block must divide dim")
        if v == "adaptive" and self.adaptive_buckets <= 0:
            raise ValueError(f"{self.name}: adaptive needs adaptive_buckets")


@dataclasses.dataclass(frozen=True)
class RecModel:
    name: str
    table_specs: Dict[str, TableSpec]
    init_params: Callable           # (prng_key) -> params pytree
    # forward(params, batch, acts, train) -> logits [B], or {task: logits [B]}
    # for multi-task models (tasks non-empty; labels read from
    # batch["labels"][task]).
    forward: Callable
    dense_dim: int = 13
    tasks: Sequence[str] = ()


def make_tables(
    model: RecModel,
    option: Optional[cfg.EmbeddingVariableOption] = None,
    key_dtype=jnp.int32,
    value_dtype=jnp.float32,
    capacity: Optional[int] = None,
) -> Dict[str, ev.EmbeddingTable]:
    """Create the physical tables for a model (grouped per the group plan).

    ``capacity`` overrides every physical table's initial capacity (power of
    two); otherwise the group plan's capacity (sum of member specs) is used.
    ``option.initial_capacity`` is NOT consulted — capacity is a per-physical
    -table property, set explicitly here or via the TableSpecs.
    """

    from deeprec_tpu.embedding import group as grp

    plan = grp.plan_groups(model.table_specs)
    tables = {}
    max_key = int(jnp.iinfo(key_dtype).max)
    for name, pspec in plan.physical.items():
        if (len(pspec.members) - 1) << pspec.id_bits > max_key:
            raise ValueError(
                f"physical table {name}: {len(pspec.members)} members x "
                f"id_bits={pspec.id_bits} overflows {key_dtype}"
            )
        if key_dtype != jnp.int32:
            for lname, _ in pspec.members:
                if model.table_specs[lname].cross:
                    # Crossed columns mark missing components with the
                    # int32 EMPTY sentinel; after astype(key_dtype) that
                    # is NOT empty_key(int64), so padded positions would
                    # become real trainable ids.
                    raise ValueError(
                        f"{lname}: crossed columns require int32 table "
                        f"keys (got {jnp.dtype(key_dtype).name})")
        opt = option or cfg.EmbeddingVariableOption()
        cap = capacity or pspec.initial_capacity
        opt = dataclasses.replace(opt, initial_capacity=cap)
        tables[name] = ev.create(name, pspec.dim, key_dtype=key_dtype,
                                 value_dtype=value_dtype, option=opt)
    return tables


# Criteo column layout (modelzoo/dlrm/train.py:33-37)
CONTINUOUS_COLUMNS = [f"I{i}" for i in range(1, 14)]
CATEGORICAL_COLUMNS = [f"C{i}" for i in range(1, 27)]
LABEL_COLUMN = "clicked"
