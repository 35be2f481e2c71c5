"""Fail-fast HBM budgeting (round-5 verdict #8).

The two known per-device memory cliffs are surfaced as CHECKED budgets at
the point where the allocation decision is made, instead of as device OOMs
minutes into a job:

  * **growth peak** — a 2x capacity rebuild holds old C + new 2C live
    simultaneously (XLA buffer donation cannot alias across the shape
    change; see the growth-memory note in embedding/table.py), so the
    transient peak is ``other tables + old + new`` for the growing table;
  * **bounded-staleness FIFO** — k entries of exchange-bucket state per
    table (batch-proportional after the round-5 fix, but k x tables x
    batch still adds up at large batch).

``Trainer(budget_bytes=...)`` / ``DistributedTrainer(budget_bytes=...)``
take the PER-DEVICE HBM budget in bytes; checks raise
:class:`MemoryBudgetError` with the offending numbers and remedies.

Reference analogue: the EV allocator / memory-planner discipline
(`tensorflow/core/common_runtime/memory_planner.h:182`,
`tensorpool_allocator.h:43` — trace allocations during
START/STOP_STATISTIC_STEP, then plan slab reuse; SURVEY.md §2.3).  Here
every allocation is a statically-shaped XLA buffer, so the plan can be
CHECKED up front instead of traced: the check runs where the allocation
decision is made and fails before the first byte is committed.
"""

from __future__ import annotations

from typing import Optional


class MemoryBudgetError(RuntimeError):
    """A planned allocation would exceed the configured per-device budget."""


def table_state_bytes(table, capacity: Optional[int] = None) -> int:
    """Per-DEVICE bytes of one table's state at ``capacity`` (defaults to
    the current capacity).  Stacked ([S, ...]) tables report ONE shard —
    the per-device cost on the mesh.  Capacity-proportional planes (keys,
    values, optimizer slots, freqs/versions/touched) scale with the target
    capacity; the CBF sketch and the default-row pool are constant."""

    stacked = table.keys.ndim == 2
    shards = int(table.keys.shape[0]) if stacked else 1
    cap = int(table.keys.shape[-1])
    target = int(capacity if capacity is not None else cap)

    per_cap = 0
    planes = [table.keys, table.values] + list(table.slots.values())
    planes += [x for x in (table.freqs, table.versions, table.touched)
               if x is not None]
    for x in planes:
        per_cap += x.size * x.dtype.itemsize // shards
    const = 0
    if table.cbf is not None:
        const += table.cbf.size * table.cbf.dtype.itemsize // shards
    if table.default_rows is not None:
        const += table.default_rows.size * table.default_rows.dtype.itemsize
    return per_cap * target // cap + const


def tables_state_bytes(tables) -> int:
    """Per-device bytes of a whole {name: table} dict at current shapes."""

    return sum(table_state_bytes(t) for t in tables.values())


def fifo_entry_bytes(table, n: int) -> int:
    """Per-device bytes of ONE staleness-FIFO entry buffering ``n``
    positions of ``table``: the Lookup planes minus slot_counts (uids +
    counts/inverse/slot_ids int32 + admitted/valid bool) plus the [n, D]
    grad.  Single source of truth for the budget estimate — mirrors the
    entry layout in train/loop.py and parallel/trainer.py _zero_pending
    (which strip slot_counts; a plane added there must be added here)."""

    key = table.keys.dtype.itemsize
    val = table.values.dtype.itemsize
    return n * (key + 3 * 4 + 2 * 1 + table.dim * val)


def pending_bytes(pending) -> int:
    """Actual per-device bytes of a live staleness FIFO pytree (global
    leaves are sharded over the mesh axis, so device bytes = leaf bytes /
    num shards only for stacked planes — FIFO leaves are 1-D over the
    axis, full size per host; report the global size as the conservative
    bound)."""

    if pending is None:
        return 0
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(pending))


def check_growth(tables, name: str, new_capacity: int,
                 budget_bytes: Optional[int],
                 extra_bytes: int = 0) -> None:
    """Raise if growing ``name`` to ``new_capacity`` would blow the budget
    at the REBUILD PEAK (old + new live simultaneously).  ``extra_bytes``
    covers other resident state the caller knows about — the staleness
    FIFO, and intermediate copies during a multi-doubling loop."""

    if not budget_bytes:
        return
    now = tables_state_bytes(tables) + extra_bytes
    new = table_state_bytes(tables[name], new_capacity)
    peak = now + new  # old table still resident during the rebuild
    if peak > budget_bytes:
        cur = table_state_bytes(tables[name])
        raise MemoryBudgetError(
            f"growing table {name!r} to capacity {new_capacity} would peak "
            f"at ~{peak / 2**20:.0f} MiB/device ({now / 2**20:.0f} MiB "
            f"resident incl. all tables"
            + (f" + {extra_bytes / 2**20:.0f} MiB FIFO/intermediate state"
               if extra_bytes else "")
            + f", + {new / 2**20:.0f} MiB new copy; the {cur / 2**20:.0f} "
            f"MiB old copy cannot be donated across the shape change) — "
            f"budget_bytes is {budget_bytes / 2**20:.0f} MiB.  Remedies: "
            f"raise the budget, attach multi-tier storage (tiers=) so cold "
            f"rows demote instead of growing, start at a larger "
            f"initial_capacity, or shard over more devices.")


def check_staleness_fifo(tables, fifo_bytes: int, staleness: int,
                         budget_bytes: Optional[int]) -> None:
    """Raise if priming the bounded-staleness FIFO would exceed the budget
    on top of the resident tables."""

    if not budget_bytes:
        return
    now = tables_state_bytes(tables)
    if now + fifo_bytes > budget_bytes:
        raise MemoryBudgetError(
            f"the staleness={staleness} gradient FIFO needs "
            f"~{fifo_bytes / 2**20:.0f} MiB/device on top of "
            f"{now / 2**20:.0f} MiB of resident tables — budget_bytes is "
            f"{budget_bytes / 2**20:.0f} MiB.  The FIFO is k x per-step "
            f"exchange state (batch-proportional): lower staleness, shrink "
            f"the batch, or raise the budget.")
