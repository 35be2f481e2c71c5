"""Group embedding: stack N same-dim logical tables into one physical table.

TPU-native re-design of the reference's GroupEmbedding capability
(core/kernels/group_embedding/, ``tf.nn.group_embedding_lookup_sparse``,
python/ops/group_embedding_lookup_ops.py): where the reference batches N
lookups into one kernel *launch*, here N logical tables share one physical
hash table — a single lookup-or-insert, one gather, one sparse-apply for the
whole group.  On TPU this collapses N while-loop subgraphs into one (≈N×
compile-time reduction) and turns many small scatters into one large batched
one (VPU-friendly).

Key composition: logical feature ``f`` with id ``x`` maps to physical key
``(f << id_bits) | (x & (2^id_bits - 1))``.  The mask reproduces
hash-bucket semantics (categorical_column_with_hash_bucket); the EMPTY
sentinel passes through unchanged so padding stays padding.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from deeprec_tpu import config as cfg


@dataclasses.dataclass(frozen=True)
class PhysicalTableSpec:
    """One physical table backing a group of logical features."""

    name: str
    dim: int
    # (logical table name, feature index within group)
    members: Tuple[Tuple[str, int], ...]
    id_bits: int
    initial_capacity: int


@dataclasses.dataclass(frozen=True)
class GroupPlan:
    physical: Dict[str, PhysicalTableSpec]
    # logical table name -> (physical name, feature index or None if ungrouped)
    logical: Dict[str, Tuple[str, Optional[int]]]


def plan_groups(table_specs) -> GroupPlan:
    """Partition TableSpecs into physical tables.

    Specs with the same ``group`` name (and equal dim) stack; ungrouped specs
    get their own physical table (feature index None).
    """

    physical: Dict[str, PhysicalTableSpec] = {}
    logical: Dict[str, Tuple[str, Optional[int]]] = {}
    groups: Dict[str, List[str]] = {}
    for name, spec in table_specs.items():
        g = getattr(spec, "group", None)
        if getattr(spec, "variant", None) == "multihash":
            # Q-R compositional tables are dense params, not EV-backed —
            # no physical hash table (handled by the Trainer's variant path).
            continue
        if g is None:
            physical[name] = PhysicalTableSpec(
                name=name, dim=spec.dim, members=((name, 0),),
                id_bits=getattr(spec, "id_bits", 26),
                initial_capacity=spec.initial_capacity,
            )
            logical[name] = (name, None)
        else:
            groups.setdefault(g, []).append(name)

    for g, names in groups.items():
        # Mixed-dim groups partition into one physical table per distinct
        # dim ("__group_<g>_d<dim>") — the reference's group ops batch
        # lookups of arbitrary per-table dims into one launch
        # (group_embedding_lookup_ops.py); here the compile-unit count is
        # the number of DISTINCT dims (1-3 in practice), not the member
        # count, and no row storage is wasted on padding.
        by_dim: Dict[int, List[str]] = {}
        for n in names:
            by_dim.setdefault(table_specs[n].dim, []).append(n)
        multi = len(by_dim) > 1
        for dim, members in sorted(by_dim.items()):
            id_bits = max(getattr(table_specs[n], "id_bits", 26)
                          for n in members)
            if len(members) << id_bits >= 2 ** 62:
                raise ValueError(
                    f"group {g!r}: id_bits too large for member count")
            phys = f"__group_{g}_d{dim}" if multi else f"__group_{g}"
            # capacity for the union of members' key spaces, rounded to pow2
            total = sum(table_specs[n].initial_capacity for n in members)
            cap = 1 << (total - 1).bit_length()
            physical[phys] = PhysicalTableSpec(
                name=phys, dim=dim,
                members=tuple((n, i) for i, n in enumerate(members)),
                id_bits=id_bits,
                initial_capacity=cap,
            )
            for i, n in enumerate(members):
                logical[n] = (phys, i)
    return GroupPlan(physical=physical, logical=logical)


def group_key(ids: jnp.ndarray, feat_idx: Optional[int], id_bits: int,
              empty: int) -> jnp.ndarray:
    """Compose the physical key; EMPTY padding passes through."""

    if feat_idx is None:
        return ids
    dt = ids.dtype
    mask = jnp.asarray((1 << id_bits) - 1, dt)
    composed = (ids & mask) | jnp.asarray(feat_idx << id_bits, dt)
    return jnp.where(ids == empty, jnp.asarray(empty, dt), composed)


def split_key(keys: jnp.ndarray, id_bits: int):
    """(feature index, raw id) from physical keys — for export/debug."""

    mask = jnp.asarray((1 << id_bits) - 1, keys.dtype)
    return (keys >> id_bits).astype(jnp.int32), keys & mask
