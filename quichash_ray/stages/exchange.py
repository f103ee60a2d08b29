"""Two-stage hash exchange — the engine's hot-path banded shuffle.

``hash_exchange(ds, part_col, fn, num_parts)`` applies ``fn`` once per hash
partition, with every row of a partition in one Arrow table — the same
semantics as ``ds.groupby(part_col).map_groups(fn)``.

Why not just groupby? Ray Data's sort-based groupby pays a serialized
control-plane cost per input block plus an O(n log n) sort the banded
pattern doesn't need (rows are already tagged with their partition id; only
*routing* is required). Measured on this engine's candidate exchange
(32M rows, 1.2 GB, 32 partitions, 256 input blocks): sort groupby 20 s,
hash-shuffle groupby 38 s, this exchange 7 s. The implementation is the
classic split/merge shuffle expressed in raw Ray tasks — one split task per
input block emitting ``num_parts`` slices (``num_returns=P``), one merge
task per partition gathering its slices — which is exactly the case the
design rules reserve raw tasks for: semantics the Dataset API expresses
only through a sort it doesn't need.

Scale notes: the flat split/merge path creates blocks × num_parts small
objects; both grow ~linearly with input, so a 10^4-block × 10^3-partition
cluster job would create 10^7 objects. The exchange AUTO-SELECTS its
regime by expected object count (``QUICHASH_EXCHANGE_MAX_OBJECTS``,
default 32768 — the measured flat↔two-level crossover band, see
``_MAX_OBJECTS_DEFAULT``):

- under the budget → flat split/merge (one slice per block per partition);
- over it → TWO-LEVEL split/merge: blocks split into S super-partitions
  (contiguous partition ranges, S sized to the budget), one merge task per
  super-partition then applies ``fn`` per final partition locally —
  objects drop from B×P to B×S + S while staying on the measured-3×-faster
  raw-task path;
- only when even S would be tiny (pathological block counts) → the
  Dataset-native sort-groupby streaming shuffle.

GIANT regime (round-4): at 100-TB corpus scale even post-projection key
rows are ~1 TB of plasma residency per exchange. Since every caller
derives ``num_parts`` from its row count via ``choose_num_parts`` (64
MB/part target), ``num_parts`` is itself the input-size signal: at or
above ``QUICHASH_EXCHANGE_STREAM_PARTS`` (default 4096 ≈ 256 GB of
exchanged rows) the exchange routes to the Dataset-native sort-groupby
shuffle on the LAZY inputs — fully streaming, spill handled by Ray's
shuffle, no up-front materialization. Single-node runs never reach 4096
parts, so the measured-faster raw-task path still serves the local/mid
regime.

STREAMING SPLIT (round-5): below the giant threshold, LAZY inputs no
longer ``materialize()`` before splitting. Block refs are pulled from
the streaming topology (``iter_internal_ref_bundles``) and each block's
split task launches AS THE BLOCK LANDS, after which the exchange drops
its input ref — Ray frees the block the moment its split completes, so
peak plasma residency is ~1× the input (as split slices awaiting merge)
instead of the old 2× (full materialized input + its slices). Because
the block count is unknown until the stream ends, the streaming path
commits upfront to the two-level shape with S = min(num_parts,
2×CPUs) range-partitions (S=num_parts degenerates to the flat shape;
object count stays B×S ≤ B×2×CPUs, linear in blocks — the giant-parts
guard above routes anything big enough for that to matter to the sort
shuffle first). Inputs the CALLER already materialized keep the exact
budget-based flat/two-level/sort choice over their known block refs —
their residency is the caller's, and the measured crossovers stay
honored where block counts are actually known.

Callers never pass the flag; ``use_sort_groupby=True`` remains as the
explicit semantics reference used by the equivalence tests.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pyarrow as pa
from ray.data import Dataset

# above this many expected shuffle objects (input blocks × num_parts) the
# split/merge path is counterproductive — auto-switch to sort-groupby
# Measured crossover (32 CPUs, 2-col int64 payloads, 2026-08-17): flat
# split/merge ties two-level at ~8k expected objects and loses 2-4× from
# ~32k up (4.2× at 64×512, 4.9× at 256×1024 where flat is even slower
# than the sort path); the production fuzzy pipeline's own exchanges
# (blocks×P ≤ ~25k at 8M rows) stay measurably best on the flat path.
_MAX_OBJECTS_DEFAULT = 32_768


def _max_objects() -> int:
    return int(
        os.environ.get("QUICHASH_EXCHANGE_MAX_OBJECTS", _MAX_OBJECTS_DEFAULT)
    )


# num_parts at/above which the exchange skips materialization entirely and
# streams through the sort-groupby shuffle (giant regime; module docstring)
_STREAM_PARTS_DEFAULT = 4096


def _stream_parts() -> int:
    return int(
        os.environ.get("QUICHASH_EXCHANGE_STREAM_PARTS", _STREAM_PARTS_DEFAULT)
    )


# driver-side observability: the regime the last hash_exchange call chose
# ("split" | "split2" | "stream" | "sort") — read by tests and lineage,
# never by control flow
_LAST_REGIME: str | None = None


def _empty_like(ds: Dataset) -> pa.Table:
    schema = ds.schema()
    base = getattr(schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base.empty_table()
    return pa.schema(
        [(n, t) for n, t in zip(schema.names, schema.types)]
    ).empty_table()


def hash_exchange(
    inputs: Dataset | list[Dataset],
    part_col: str,
    fn: Callable[[pa.Table], pa.Table],
    num_parts: int,
    drop_part: bool = True,
    use_sort_groupby: bool | None = None,
) -> Dataset:
    """Apply ``fn`` per hash partition of ``inputs`` (a Dataset or a list —
    a list is exchanged as its union, no separate union op needed).

    ``part_col`` must hold values in [0, num_parts); every row with the
    same value is delivered to exactly one ``fn`` call, in one table.
    The result is a Dataset of ``num_parts`` blocks.

    ``use_sort_groupby=None`` (the default) auto-selects: split/merge for
    the local/mid regime, sort-groupby when input blocks × num_parts would
    exceed the object-count budget (see module docstring).
    """
    import ray
    import ray.data

    ds_list = inputs if isinstance(inputs, list) else [inputs]

    def _sort_path(lst: list[Dataset]) -> Dataset:
        global _LAST_REGIME
        _LAST_REGIME = "sort"
        ds = lst[0]
        for other in lst[1:]:
            ds = ds.union(other)
        wrapped = (
            (lambda g: fn(g.drop_columns([part_col]))) if drop_part else fn
        )
        return ds.groupby(part_col).map_groups(
            wrapped, batch_format="pyarrow"
        )

    if use_sort_groupby:
        return _sort_path(ds_list)

    # giant regime: stream — num_parts is size-derived by every caller, so
    # a huge P means a huge input; don't materialize it into plasma first
    # (see module docstring)
    if use_sort_groupby is None and num_parts >= _stream_parts():
        return _sort_path(ds_list)

    @ray.remote
    def split_block(t: pa.Table, P: int):
        if not isinstance(t, pa.Table):
            # Ray Data materializes schema-less (typically empty) blocks
            # as pandas even under batch_format="pyarrow" upstream maps —
            # coerce so the arrow path below is total
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows == 0 or part_col not in t.column_names:
            # Ray passes empty blocks through map_batches without calling
            # the UDF, so an empty block can surface here with the pre-map
            # schema; merge_part drops empty slices, and every partition fn
            # handles the all-empty case without reading columns.
            empty = t.slice(0, 0)
            return (empty,) * P if P > 1 else (empty,)
        part = np.asarray(t[part_col], dtype=np.int64)
        order = np.argsort(part, kind="stable")
        t2 = t.take(pa.array(order, pa.int64()))
        if drop_part:
            t2 = t2.drop_columns([part_col])
        ps = part[order]
        # searchsorted slicing would silently DROP rows outside
        # [0, num_parts) — a caller with a mismatched modulus must fail
        # loudly, not lose data (no-silent-drops principle)
        if ps[0] < 0 or ps[-1] >= P:
            raise ValueError(
                f"{part_col} values outside [0, {P}): "
                f"min={ps[0]}, max={ps[-1]}"
            )
        bounds = np.searchsorted(ps, np.arange(P + 1))
        return tuple(
            t2.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(P)
        )

    @ray.remote
    def merge_part(*tbls):
        live = [t for t in tbls if t.num_rows]
        if not live:
            base = tbls[0].schema if tbls else None
            empty = (
                base.empty_table() if base is not None else pa.table({})
            )
            return fn(empty)
        return fn(pa.concat_tables(live, promote_options="default"))

    from ray.data.dataset import MaterializedDataset

    global _LAST_REGIME

    if not all(isinstance(d, MaterializedDataset) for d in ds_list):
        # STREAMING SPLIT (module docstring): lazy input — launch one
        # split task per block as the streaming executor emits it and
        # drop the input ref immediately; never hold the whole projected
        # input in plasma. Block count is unknown upfront, so commit to
        # the two-level shape with a CPU-derived S (S=num_parts is the
        # flat shape; objects stay linear in blocks).
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        S = int(min(max(2, num_parts), max(2 * n_cpus, 4)))
        split_super, merge_super = _two_level_tasks(
            part_col, fn, max(2, num_parts), S, drop_part
        )
        split_refs = []
        for d in ds_list:
            for bundle in d.iter_internal_ref_bundles():
                for bref in bundle.block_refs:
                    split_refs.append(
                        split_super.options(num_returns=S).remote(bref)
                    )
        if not split_refs:
            return ray.data.from_arrow(fn(_empty_like(ds_list[0])))
        _LAST_REGIME = "stream"
        merged = [
            merge_super.remote(s, *[sr[s] for sr in split_refs])
            for s in range(S)
        ]
        return ray.data.from_arrow_refs(merged)

    mats = ds_list  # already materialized by the caller
    refs: list = []
    for m in mats:
        refs.extend(m.to_arrow_refs())
    if not refs:
        return ray.data.from_arrow(fn(_empty_like(ds_list[0])))
    budget = _max_objects()
    if use_sort_groupby is None and len(refs) * num_parts > budget:
        # over the object budget: try the two-level shape — S super-
        # partitions sized so blocks × S fits the budget but enough tasks
        # exist to keep the cluster busy
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        S = min(num_parts, max(2 * n_cpus, 2), budget // len(refs))
        if S >= 4:
            return _two_level_exchange(
                refs, part_col, fn, num_parts, int(S), drop_part
            )
        # pathological block count — fall back to the streaming sort shuffle
        return _sort_path(mats)
    _LAST_REGIME = "split"
    num_parts = max(2, num_parts)  # num_returns=1 would unwrap the tuple
    split_refs = [
        split_block.options(num_returns=num_parts).remote(r, num_parts)
        for r in refs
    ]
    merged = [
        merge_part.remote(*[sr[p] for sr in split_refs])
        for p in range(num_parts)
    ]
    return ray.data.from_arrow_refs(merged)


def _two_level_tasks(
    part_col: str,
    fn: Callable[[pa.Table], pa.Table],
    num_parts: int,
    num_super: int,
    drop_part: bool,
):
    """Build the (split_super, merge_super) remote task pair for a
    two-level exchange: level 1 routes rows to ``num_super`` contiguous
    partition RANGES (B × S objects); the level-2 task for a range holds
    every row of its partitions, so it applies ``fn`` per final partition
    locally and emits one concatenated result block — no third hop.
    Equivalent to the flat exchange for any per-partition ``fn``; result
    has ``num_super`` blocks instead of ``num_parts``.
    """
    import ray

    P, S = num_parts, num_super

    @ray.remote
    def split_super(t: pa.Table):
        if not isinstance(t, pa.Table):
            # streaming path hands raw blocks — schema-less empty blocks
            # surface as pandas (same coercion as split_block)
            t = pa.Table.from_pandas(t, preserve_index=False)
        if t.num_rows == 0 or part_col not in t.column_names:
            empty = t.slice(0, 0)
            return (empty,) * S if S > 1 else (empty,)
        part = np.asarray(t[part_col], dtype=np.int64)
        order = np.argsort(part, kind="stable")
        t2 = t.take(pa.array(order, pa.int64()))
        ps = part[order]
        if ps[0] < 0 or ps[-1] >= P:
            raise ValueError(
                f"{part_col} values outside [0, {P}): "
                f"min={ps[0]}, max={ps[-1]}"
            )
        # super s owns partitions [s*P//S, (s+1)*P//S)
        edges = (np.arange(S + 1, dtype=np.int64) * P) // S
        bounds = np.searchsorted(ps, edges)
        return tuple(
            t2.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(S)
        )

    @ray.remote
    def merge_super(s: int, *tbls):
        live = [t for t in tbls if t.num_rows]
        lo = (s * P) // S
        hi = ((s + 1) * P) // S
        if not live:
            base = tbls[0].schema if tbls else None
            empty = base.empty_table() if base is not None else pa.table({})
            if drop_part and part_col in empty.column_names:
                empty = empty.drop_columns([part_col])
            outs = [fn(empty) for _ in range(lo, hi)]
            return pa.concat_tables(outs, promote_options="default")
        g = pa.concat_tables(live, promote_options="default")
        part = np.asarray(g[part_col], dtype=np.int64)
        order = np.argsort(part, kind="stable")
        g2 = g.take(pa.array(order, pa.int64()))
        if drop_part:
            g2 = g2.drop_columns([part_col])
        ps = part[order]
        bounds = np.searchsorted(ps, np.arange(lo, hi + 1))
        outs = [
            fn(g2.slice(bounds[i], bounds[i + 1] - bounds[i]))
            for i in range(hi - lo)
        ]
        return pa.concat_tables(outs, promote_options="default")

    return split_super, merge_super


def _two_level_exchange(
    refs: list,
    part_col: str,
    fn: Callable[[pa.Table], pa.Table],
    num_parts: int,
    num_super: int,
    drop_part: bool,
):
    """Two-level split/merge over known block refs (see _two_level_tasks)."""
    import ray.data

    S = num_super
    split_super, merge_super = _two_level_tasks(
        part_col, fn, num_parts, S, drop_part
    )
    global _LAST_REGIME
    _LAST_REGIME = "split2"
    split_refs = [
        split_super.options(num_returns=S).remote(r) for r in refs
    ]
    merged = [
        merge_super.remote(s, *[sr[s] for sr in split_refs])
        for s in range(S)
    ]
    return ray.data.from_arrow_refs(merged)
