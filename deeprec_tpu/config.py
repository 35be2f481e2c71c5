"""Typed configuration tree for embedding variables and training.

TPU-native equivalent of the reference's option-object surface
(``EmbeddingVariableOption`` tree, reference python/ops/variables.py:180-300,
``embedding_config.h:11-45``).  One dataclass tree + env overrides replaces the
reference's three config mechanisms (ConfigProto knobs / env vars / option
objects).
"""

from __future__ import annotations

import dataclasses
import enum
import os
from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp


class StorageType(enum.Enum):
    """Where an embedding table's value store lives.

    Mirrors reference StorageType enum (config.proto:5-27), re-mapped to TPU
    tiers: HBM = device-resident sharded arrays; DRAM = host-memory cold tier;
    SSD = disk log-structured KV (native C++).
    """

    HBM = "hbm"
    DRAM = "dram"
    HBM_DRAM = "hbm_dram"
    HBM_DRAM_SSD = "hbm_dram_ssd"
    DRAM_SSD = "dram_ssd"


class CacheStrategy(enum.Enum):
    """Hot-id tracking policy for multi-tier residency (cache.h:19)."""

    LFU = "lfu"
    LRU = "lru"


class Combiner(enum.Enum):
    SUM = "sum"
    MEAN = "mean"
    SQRTN = "sqrtn"


@dataclasses.dataclass(frozen=True)
class InitializerOption:
    """How new keys' embedding rows are initialized.

    Reference: InitializerOption (variables.py:180).  ``default_value_dim``
    mirrors the reference's bucketed-default trick: rows are initialized from a
    pool of ``default_value_dim`` deterministic rows selected by key hash, so a
    key's initial value is stable across restarts and shards.
    """

    initializer: str = "truncated_normal"  # truncated_normal | uniform | zeros | constant
    stddev: float = 0.05
    minval: float = -0.05
    maxval: float = 0.05
    constant: float = 0.0
    default_value_dim: int = 4096
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class CounterFilterOption:
    """Admission by raw access count (counter_filter_policy.h:25).

    A key becomes trainable only after it has been seen ``filter_freq`` times;
    before that, lookups read ``default_value_no_permission`` and optimizer
    updates are skipped (counter_filter_policy.h:106-136).
    """

    filter_freq: int = 0


@dataclasses.dataclass(frozen=True)
class CBFFilterOption:
    """Admission by counting-Bloom-filter estimate (bloom_filter_policy.h:33).

    Keys are not inserted into the main table until the CBF min-count reaches
    ``filter_freq`` — keeps the table unpolluted by one-shot ids.
    """

    filter_freq: int = 0
    max_element_size: int = 2 ** 20
    false_positive_probability: float = 0.01
    counter_dtype: Any = jnp.int32


@dataclasses.dataclass(frozen=True)
class GlobalStepEvictOption:
    """TTL eviction: drop keys not updated for ``steps_to_live`` steps
    (globalstep_shrink_policy.h)."""

    steps_to_live: int = 0


@dataclasses.dataclass(frozen=True)
class L2WeightEvictOption:
    """Drop keys whose half-squared L2 norm (0.5 * sum v^2) fell below
    threshold — the reference's exact shrink rule
    (l2weight_shrink_policy.h:52-57)."""

    l2_weight_threshold: float = -1.0


@dataclasses.dataclass(frozen=True)
class StorageOption:
    """Tiered-storage config (StorageOption, variables.py:230).

    ``hbm_capacity`` bounds the device-resident hot tier (slots); overflow is
    evicted to the host DRAM tier by LFU/LRU, then optionally to SSD.
    """

    storage_type: StorageType = StorageType.HBM
    cache_strategy: CacheStrategy = CacheStrategy.LFU
    hbm_capacity: int = 0  # 0 = unbounded (single tier)
    dram_capacity: int = 0
    ssd_path: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class EmbeddingVariableOption:
    """Top-level per-EV option bundle (EmbeddingVariableOption, variables.py:261)."""

    init: InitializerOption = InitializerOption()
    counter_filter: Optional[CounterFilterOption] = None
    cbf_filter: Optional[CBFFilterOption] = None
    global_step_evict: Optional[GlobalStepEvictOption] = None
    l2_weight_evict: Optional[L2WeightEvictOption] = None
    storage: StorageOption = StorageOption()
    # Initial hash-table capacity (power of two).  Grows by doubling when load
    # factor exceeds ``max_load_factor`` (host-mediated, between steps).
    initial_capacity: int = 2 ** 14
    max_load_factor: float = 0.75
    # Record per-key frequency / version metadata (record_freq,
    # embedding_config.h:30).  Needed by filters, tiering, WithCounts
    # optimizers and incremental checkpoints.
    record_freq: bool = True
    record_version: bool = True
    # Track touched keys for incremental checkpointing.
    record_touched: bool = False
    default_value_no_permission: float = 0.0


# ---------------------------------------------------------------------------
# option-tree (de)serialization — makes checkpoints self-describing (the
# reference ships the training-time option tree inside the SavedModel the
# Processor restores from; here it travels as model_meta.json).


def option_to_dict(opt):
    """Recursively encode a config dataclass to plain-JSON types."""

    if opt is None or isinstance(opt, (int, float, str, bool)):
        return opt
    if isinstance(opt, enum.Enum):
        return {"__enum__": type(opt).__name__, "value": opt.value}
    if dataclasses.is_dataclass(opt):
        return {"__class__": type(opt).__name__,
                **{f.name: option_to_dict(getattr(opt, f.name))
                   for f in dataclasses.fields(opt)}}
    if isinstance(opt, (list, tuple)):
        return [option_to_dict(v) for v in opt]
    # jnp dtypes and anything dtype-like
    import numpy as _np

    try:
        return {"__dtype__": _np.dtype(opt).name}
    except TypeError:
        raise TypeError(f"cannot serialize config value {opt!r}")


_OPTION_CLASSES = None


def _option_classes():
    global _OPTION_CLASSES
    if _OPTION_CLASSES is None:
        import sys

        mod = sys.modules[__name__]
        _OPTION_CLASSES = {
            n: c for n, c in vars(mod).items()
            if isinstance(c, type)
            and (dataclasses.is_dataclass(c) or issubclass(c, enum.Enum))
        }
    return _OPTION_CLASSES


def option_from_dict(d):
    """Inverse of option_to_dict."""

    if d is None or isinstance(d, (int, float, str, bool)):
        return d
    if isinstance(d, list):
        return [option_from_dict(v) for v in d]
    if "__dtype__" in d:
        import numpy as _np

        return _np.dtype(d["__dtype__"])
    if "__enum__" in d:
        return _option_classes()[d["__enum__"]](d["value"])
    if "__class__" in d:
        cls = _option_classes()[d["__class__"]]
        kw = {k: option_from_dict(v) for k, v in d.items()
              if k != "__class__"}
        return cls(**kw)
    raise ValueError(f"unrecognized config encoding: {d!r}")


def env_flag(name: str, default: str = "") -> str:
    """Environment override hook (the reference's env-var config plane)."""

    return os.environ.get(name, default)


def env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v else default


def env_bool(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.lower() in ("1", "true", "yes", "on")
