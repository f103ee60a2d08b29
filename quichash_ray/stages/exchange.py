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

Scale notes: object count is blocks × num_parts; both grow ~linearly with
input, so a 10^4-block × 10^3-partition job would create 10^7 small
objects — above ~10^6 expected objects callers should set
``use_sort_groupby=True`` (the Dataset-native path, kept for exactly this
regime and as the semantics reference in tests).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
from ray.data import Dataset


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
    use_sort_groupby: bool = False,
) -> Dataset:
    """Apply ``fn`` per hash partition of ``inputs`` (a Dataset or a list —
    a list is exchanged as its union, no separate union op needed).

    ``part_col`` must hold values in [0, num_parts); every row with the
    same value is delivered to exactly one ``fn`` call, in one table.
    The result is a Dataset of ``num_parts`` blocks.
    """
    import ray
    import ray.data

    ds_list = inputs if isinstance(inputs, list) else [inputs]

    if use_sort_groupby:
        ds = ds_list[0]
        for other in ds_list[1:]:
            ds = ds.union(other)
        wrapped = (
            (lambda g: fn(g.drop_columns([part_col]))) if drop_part else fn
        )
        return ds.groupby(part_col).map_groups(
            wrapped, batch_format="pyarrow"
        )

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

    refs: list = []
    for ds in ds_list:
        refs.extend(ds.materialize().to_arrow_refs())
    if not refs:
        return ray.data.from_arrow(fn(_empty_like(ds_list[0])))
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
