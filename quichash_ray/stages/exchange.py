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

Scale notes: the split/merge path creates blocks × num_parts small objects;
both grow ~linearly with input, so a 10^4-block × 10^3-partition cluster job
would create 10^7 objects and resident-materialize its whole input in
plasma. The exchange therefore AUTO-SELECTS its regime: when the expected
object count exceeds ``QUICHASH_EXCHANGE_MAX_OBJECTS`` (default 10^6) it
transparently takes the Dataset-native sort-groupby path (Ray Data's
streaming shuffle — slower locally, but no object-count blowup and no
full-input plasma residency). Callers never pass the flag;
``use_sort_groupby=True`` remains as the explicit semantics reference used
by the equivalence tests.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pyarrow as pa
from ray.data import Dataset

# above this many expected shuffle objects (input blocks × num_parts) the
# split/merge path is counterproductive — auto-switch to sort-groupby
_MAX_OBJECTS_DEFAULT = 1_000_000


def _max_objects() -> int:
    return int(
        os.environ.get("QUICHASH_EXCHANGE_MAX_OBJECTS", _MAX_OBJECTS_DEFAULT)
    )


# driver-side observability: the regime the last hash_exchange call chose
# ("split" | "sort") — read by tests and lineage, never by control flow
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

    @ray.remote
    def split_block(t: pa.Table, P: int):
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

    mats = [ds.materialize() for ds in ds_list]
    refs: list = []
    for m in mats:
        refs.extend(m.to_arrow_refs())
    if not refs:
        return ray.data.from_arrow(fn(_empty_like(ds_list[0])))
    if use_sort_groupby is None and len(refs) * num_parts > _max_objects():
        # auto-switch: the split/merge object count would blow the budget —
        # take Ray Data's streaming sort shuffle over the (already
        # materialized) inputs instead
        return _sort_path(mats)
    global _LAST_REGIME
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
