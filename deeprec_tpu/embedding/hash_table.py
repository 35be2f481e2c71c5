"""HashTable v2 — the "tensible" hash-table subsystem's python surface.

TPU-native rebuild of the reference's ``tf.hash_table`` API family
(python/ops/hash_table/hash_table.py:46,142, admit_strategy.py
BloomFilterAdmitStrategy, hash_filter.py GlobalStepFilter/L2WeightFilter,
embedding.py EmbeddingLookupHook): a general int→vector store with named
slots, pluggable admission strategies, and periodic hash filters, all built
on the same device-resident EV engine (embedding/table.py).

Everything is functional: mutating calls return a new ``HashTable`` handle
wrapping fresh table state (the handles are cheap — the arrays live on
device and are shared structurally).

  ht = HashTable(dim=8, admit=BloomFilterAdmitStrategy(minimum_frequency=2))
  ht = ht.lookup_or_insert(keys)            # training-path resolution
  rows = ht.lookup(keys)                    # read-only
  ht = ht.with_slot("accum", init=0.1)      # optimizer-slot plane
  ht = ht.filter_step(step)                 # run attached hash filters
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deeprec_tpu import config as cfg
from deeprec_tpu.embedding import table as ev


# ---------------------------------------------------------------------------
# Admit strategies (admit_strategy.py:46 BloomFilterAdmitStrategy)


@dataclasses.dataclass(frozen=True)
class BloomFilterAdmitStrategy:
    """Admit a key into the table only after its counting-Bloom estimate
    reaches ``minimum_frequency`` (reference admit_strategy.py:46; defaults
    mirror _DEFAULT_ELEMENT_SIZE / _DEFAULT_FALSE_POSITIVE_PROBABILITY)."""

    minimum_frequency: int
    max_element_size: int = 2 ** 20
    false_positive_probability: float = 0.01

    def to_option(self) -> cfg.CBFFilterOption:
        # counter width: int8 saturates at 127, so it only suffices when
        # the admission threshold sits safely below that (round-5 review:
        # the old comment said 200, which would deny 128..199 forever)
        dt = jnp.int8 if self.minimum_frequency < 100 else jnp.int32
        return cfg.CBFFilterOption(
            filter_freq=self.minimum_frequency,
            max_element_size=self.max_element_size,
            false_positive_probability=self.false_positive_probability,
            counter_dtype=dt,
        )


@dataclasses.dataclass(frozen=True)
class CounterAdmitStrategy:
    """Admit after ``minimum_frequency`` exact observed occurrences (the
    counter-filter policy, counter_filter_policy.h:25)."""

    minimum_frequency: int

    def to_option(self) -> cfg.CounterFilterOption:
        return cfg.CounterFilterOption(filter_freq=self.minimum_frequency)


# ---------------------------------------------------------------------------
# Hash filters (hash_filter.py GlobalStepFilter; L2-weight role from
# l2weight_shrink_policy.h) — periodic key-eviction hooks


@dataclasses.dataclass(frozen=True)
class GlobalStepFilter:
    """Every ``filter_interval_steps``, drop keys whose last update is older
    than the interval (hash_filter.py:168 GlobalStepFilter)."""

    filter_interval_steps: int

    def should_run(self, step: int) -> bool:
        return (self.filter_interval_steps > 0
                and step > 0 and step % self.filter_interval_steps == 0)

    def mask(self, t: ev.EmbeddingTable, step) -> jnp.ndarray:
        if t.versions is None:
            raise ValueError("GlobalStepFilter requires record_version")
        live = t.keys != t.empty
        stale = t.versions < (jnp.asarray(step, jnp.int32)
                              - self.filter_interval_steps)
        return live & stale


@dataclasses.dataclass(frozen=True)
class L2WeightFilter:
    """Drop keys whose HALF-SQUARED L2 norm (0.5 * sum v^2) fell below
    ``threshold`` — the reference's exact definition
    (l2weight_shrink_policy.h:52-57), via the hash-filter hook surface;
    identical thresholds now select identical keys here and in
    L2WeightEvictOption (round-5 review)."""

    threshold: float
    filter_interval_steps: int = 1000

    def should_run(self, step: int) -> bool:
        return (self.filter_interval_steps > 0
                and step > 0 and step % self.filter_interval_steps == 0)

    def mask(self, t: ev.EmbeddingTable, step) -> jnp.ndarray:
        live = t.keys != t.empty
        l2 = 0.5 * jnp.sum(jnp.square(t.values.astype(jnp.float32)),
                           axis=1)
        return live & (l2 < self.threshold)


# ---------------------------------------------------------------------------
# HashTable


class HashTable:
    """The reference's ``tf.hash_table.HashTable`` (hash_table.py:142): an
    int→vector table with named slot variables (optimizer state sharing the
    key space, hash_table.py:255 ``slots``), admission, and hash filters.

    Functional handle: every mutator returns a new HashTable.
    """

    def __init__(self, dim: int, *, capacity: int = 2 ** 12,
                 key_dtype=jnp.int32, value_dtype=jnp.float32,
                 initializer: str = "truncated_normal",
                 admit=None, filters: Sequence = (),
                 name: str = "hash_table",
                 _table: Optional[ev.EmbeddingTable] = None):
        self.admit = admit
        self.filters = tuple(filters)
        self.name = name
        if _table is not None:
            self._t = _table
            return
        opt = cfg.EmbeddingVariableOption(
            init=cfg.InitializerOption(initializer=initializer),
            initial_capacity=capacity)
        if isinstance(admit, BloomFilterAdmitStrategy):
            opt = dataclasses.replace(opt, cbf_filter=admit.to_option())
        elif isinstance(admit, CounterAdmitStrategy):
            opt = dataclasses.replace(opt, counter_filter=admit.to_option())
        elif admit is not None:
            raise TypeError(f"unknown admit strategy {admit!r}")
        self._t = ev.create(name, dim, key_dtype=key_dtype,
                            value_dtype=value_dtype, option=opt)

    # -- plumbing -----------------------------------------------------------

    def _wrap(self, t: ev.EmbeddingTable) -> "HashTable":
        return HashTable(t.dim, admit=self.admit, filters=self.filters,
                         name=self.name, _table=t)

    @property
    def table(self) -> ev.EmbeddingTable:
        """The underlying EV state (for savers / optimizers)."""

        return self._t

    @property
    def dim(self) -> int:
        return self._t.dim

    @property
    def size(self) -> int:
        return int(self._t.size)

    @property
    def capacity(self) -> int:
        return self._t.capacity

    @property
    def slots(self) -> Tuple[str, ...]:
        return tuple(self._t.slots)

    # -- the tf.hash_table surface -----------------------------------------

    def lookup_or_insert(self, keys, *, step=0):
        """Training-path resolution: admits/creates keys per the admit
        strategy, returns (new_handle, rows [N, D], Lookup).  The Lookup
        feeds sparse optimizers exactly like an EV's."""

        t, lk = ev.lookup_phase(self._t, jnp.asarray(keys).reshape(-1),
                                step=step, train=True)
        return self._wrap(t), ev.collect(t, lk), lk

    def lookup(self, keys, default: float = 0.0):
        """Read-only lookup; missing/un-admitted keys read ``default``."""

        _, lk = ev.lookup_phase(self._t, jnp.asarray(keys).reshape(-1),
                                train=False)
        rows = ev.collect(self._t, lk)
        # un-admitted keys are "missing" to the caller exactly like absent
        # ones: both read the caller's default, not the table's dvnp
        # (round-4 review — the docstring promised this)
        return jnp.where(lk.admitted[:, None], rows,
                         jnp.asarray(default, rows.dtype))

    def insert(self, keys, values) -> "HashTable":
        """Upsert explicit rows (bulk import; admission bypassed — import
        semantics match KvResourceImportV2's direct placement)."""

        keys = np.asarray(keys).reshape(-1)
        values = np.asarray(values).reshape(len(keys), -1)
        from deeprec_tpu.train import saver

        t = saver._bulk_import(self._t, {"keys": keys, "values": values})
        return self._wrap(t)

    def erase(self, keys) -> "HashTable":
        return self._wrap(ev.remove(self._t, jnp.asarray(keys).reshape(-1)))

    def contains(self, keys) -> jnp.ndarray:
        return ev.contains(self._t, jnp.asarray(keys).reshape(-1))

    def frequency(self, keys) -> jnp.ndarray:
        return ev.get_frequency(self._t, jnp.asarray(keys).reshape(-1))

    def with_slot(self, name: str, init: float = 0.0,
                  width: Optional[int] = None) -> "HashTable":
        """Attach a named slot plane (hash_table.py:255 slots — e.g. an
        optimizer accumulator sharing the key space)."""

        return self._wrap(ev.with_slot(self._t, name, width=width,
                                       init=init))

    def get_slot(self, name: str) -> jnp.ndarray:
        return self._t.slots[name]

    def snapshot(self):
        """(keys, values) of live entries — hash_table.py:266 snapshot."""

        keys, values, _, _, live = ev.export_live(self._t)
        live = np.asarray(live)
        return np.asarray(keys)[live], np.asarray(values)[live]

    def grow_if_needed(self) -> "HashTable":
        return self._wrap(ev.maybe_grow(self._t))

    def filter_step(self, step: int) -> "HashTable":
        """Run attached hash filters that are due at ``step`` (the
        HashFilter hook cadence, hash_filter.py:66)."""

        t = self._t
        changed = False
        for f in self.filters:
            if f.should_run(int(step)):
                m = f.mask(t, step)
                # a due filter that evicts nothing must not pay the
                # full same-capacity rebuild (shrink() does the same
                # count-gate, table.py)
                if int(jax.device_get(jnp.sum(m))) == 0:
                    continue
                t = ev._apply_evict(t, m)
                changed = True
        if not changed:
            return self
        # heal probe chains after deletion (no tombstones by design)
        return self._wrap(ev._rebuild(t, t.capacity))
