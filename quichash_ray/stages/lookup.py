"""Broadcast-vs-join lookups — the small-side-join discipline.

``attach_lookup`` joins a (usually small) key→value mapping onto a Dataset.
Below ``broadcast_limit`` rows the mapping is shipped ONCE via ``ray.put``
and applied inside ``map_batches`` (zero shuffle — the correct plan whenever
one side fits in a worker's heap, per the broadcast-small-sides rule).
Above the limit it falls back to a hash-shuffle ``Dataset.join``.

The join fallback also sidesteps a local-mode hazard worth documenting: Ray's
hash-shuffle join allocates ``num_partitions`` aggregator actors; stacking
several joins plus an actor-pool map stage into ONE streaming execution can
demand more actors than the cluster has CPUs and stall. Broadcast lookups
keep the plan actor-free; when you do need the join path at scale,
``materialize()`` the boundary between actor-heavy stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _join_num_parts(mapping_rows: int, num_partitions: int | None) -> int:
    """Partition count for the join fallback tier.

    ``None`` (the default everywhere) derives P from the MAPPING row count —
    the join only fires when the mapping exceeds the broadcast limit, so the
    mapping side is the size signal we have without materializing ``ds``.
    Key/value rows are ~16-32 B; width 32 with the standard 64 MB target
    keeps each join partition ≈2M mapping rows. A fixed P=8 here was the
    round-3 scale bug: above the broadcast limit (exactly the 100×-scale
    regime) every lookup degraded to 8 aggregators regardless of size.
    """
    from quichash_ray.stages.partitioning import choose_num_parts

    if num_partitions is not None:
        return num_partitions
    return choose_num_parts(mapping_rows, bytes_per_row=32)


def attach_lookup(
    ds: Dataset,
    mapping: Dataset,
    key_col: str,
    value_col: str,
    out_col: str | None = None,
    broadcast_limit: int = 20_000_000,
    num_partitions: int | None = None,
    default: int | None = None,
    key_col_in_mapping: str | None = None,
) -> Dataset:
    """ds ⟕ mapping(key → value_col); adds ``out_col`` (int64).

    ``key_col`` names the key in ``ds``; ``key_col_in_mapping`` names it in
    ``mapping`` when the two differ."""
    import ray

    out_col = out_col or value_col
    map_key = key_col_in_mapping or key_col
    mapping = mapping.materialize()
    if mapping.count() <= broadcast_limit:
        kc, vc = [], []
        for b in mapping.select_columns([map_key, value_col]).iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            kc.append(np.asarray(b[map_key], dtype=np.int64))
            vc.append(np.asarray(b[value_col], dtype=np.int64))
        keys_arr = np.concatenate(kc) if kc else np.empty(0, np.int64)
        vals_arr = np.concatenate(vc) if vc else np.empty(0, np.int64)
        order = np.argsort(keys_arr, kind="stable")
        ref = ray.put((keys_arr[order], vals_arr[order]))

        def kernel(b: pa.Table) -> pa.Table:
            from quichash_ray.stages.broadcast import cached_get

            km, vm = cached_get(ref)
            col = np.asarray(b[key_col], dtype=np.int64)
            if len(km) == 0:
                hit = np.zeros(len(col), dtype=bool)
                pos_c = np.zeros(len(col), dtype=np.int64)
                vm = np.zeros(1, dtype=np.int64)  # safe gather target
            else:
                pos_c = np.clip(np.searchsorted(km, col), 0, len(km) - 1)
                hit = km[pos_c] == col
            out = np.where(hit, vm[pos_c], default if default is not None else -1)
            arr = pa.array(out.astype(np.int64), pa.int64())
            if default is None:
                arr = pa.compute.if_else(
                    pa.array(hit), arr, pa.scalar(None, pa.int64())
                )
            if out_col in b.column_names:
                b = b.drop_columns([out_col])
            return b.append_column(out_col, arr)

        return ds.map_batches(
            kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    renamed = mapping.select_columns([map_key, value_col]).map_batches(
        lambda b: b.rename_columns([key_col, out_col]),
        batch_format="pyarrow", batch_size=None,
    )
    joined = ds.join(
        renamed,
        join_type="left_outer",
        num_partitions=_join_num_parts(mapping.count(), num_partitions),
        on=(key_col,),
    )
    if default is None:
        return joined

    def fill_default(b: pa.Table) -> pa.Table:
        arr = pa.compute.fill_null(
            b[out_col].cast(pa.int64()), pa.scalar(default, pa.int64())
        )
        i = b.column_names.index(out_col)
        return b.set_column(i, out_col, arr)

    return joined.map_batches(
        fill_default, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def semi_join_broadcast(
    ds: Dataset,
    keys: Dataset,
    key_col: str,
    broadcast_limit: int = 50_000_000,
    num_partitions: int | None = None,
) -> Dataset:
    """Keep ds rows whose ``key_col`` appears in ``keys`` (single column).

    Broadcast path ships a numpy id-set once; fallback is an inner join.
    """
    import ray

    keys = keys.materialize()
    if keys.count() <= broadcast_limit:
        arrs = [
            np.asarray(b[key_col])
            for b in keys.iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        idset = np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)
        ref = ray.put(idset)

        def kernel(b: pa.Table) -> pa.Table:
            from quichash_ray.stages.broadcast import cached_get

            ids = cached_get(ref)  # sorted unique (np.unique)
            col = np.asarray(b[key_col])
            if len(ids) == 0:
                return b.slice(0, 0)
            # searchsorted membership: np.isin would re-sort the broadcast
            # array on EVERY batch (O(n log n) per call at 10^6+ ids)
            pos = np.clip(np.searchsorted(ids, col), 0, len(ids) - 1)
            mask = ids[pos] == col
            return b.filter(pa.array(mask))

        return ds.map_batches(
            kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    # broadcast tier dedupes via np.unique; mirror that here so duplicate
    # keys can never multiply ds rows (semi-join, not inner-join, semantics)
    uniq = keys.select_columns([key_col]).groupby(key_col).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow"
    )
    return ds.join(
        uniq,
        join_type="inner",
        num_partitions=_join_num_parts(keys.count(), num_partitions),
        on=(key_col,),
    )
