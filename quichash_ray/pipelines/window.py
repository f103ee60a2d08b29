"""Per-key window functions — ROW_NUMBER / RANK / DENSE_RANK and LAG —
as ONE key-hash exchange + a vectorized per-partition kernel.

SQL window functions with ``PARTITION BY key ORDER BY ...`` need every row
of a key in one place, in order — exactly one hash exchange on the key
(the ``events_running_total`` shape), then a C-speed kernel per partition:
pandas sort + cumcount / boundary-flag scan (rank) / groupwise shift
(lag). No driver materialization, no per-row Python.

Scale notes (100 TB):
- the exchange is the only all-to-all; partition count is size-derived
  (``dataset_num_parts``) so per-task tables stay ~tens of MB;
- a single hot key (one user with billions of rows) is the inherent skew
  limit of ANY per-key window — same contract as SQL engines; callers with
  known whales should pre-filter or cap (``cap_per_source`` exists);
- with ``keep_top=k`` the output is bounded at k rows/key, so the wide
  result never materializes.

Oracle exactness: ordering columns must be int64/timestamp (total order,
no float ties ambiguity); ranks are int64; LAG emits genuine nulls for
each key's first row (both engine and DuckDB surface them as nullable
BIGINT → pandas float64 NaN, so value hashes agree).

Reference provenance: the reference has no window surface; this
generalizes its sort-based report ordering (reference `src/dedup.rs`
group sorting) to per-key ranked selection.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from quichash_ray.stages.exchange import hash_exchange
from quichash_ray.stages.partitioning import (
    dataset_num_parts,
    key_part_column,
    string_hash_impl,
)

_METHODS = ("row_number", "rank", "dense_rank")


def _ranks_sorted(
    df: pd.DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    method: str,
) -> np.ndarray:
    """Rank values for a frame already sorted by [key] + order_cols.

    row_number: 1..n per key.  rank: SQL RANK() (ties share the rank of
    the tie-group's first row number; gaps follow).  dense_rank: ties
    share, no gaps.  All vectorized: one boundary-flag scan, no Python
    loop over rows.
    """
    rn = df.groupby(key_col, sort=False).cumcount().to_numpy() + 1
    if method == "row_number":
        return rn.astype(np.int64)
    new_key = df[key_col].ne(df[key_col].shift()).to_numpy()
    changed = new_key.copy()
    for c in order_cols:
        col = df[c]
        changed |= col.ne(col.shift()).to_numpy()
    if method == "dense_rank":
        # cumulative count of tie-group starts, restarted per key:
        # subtract the running count at each key's start
        starts = np.cumsum(changed)
        key_base = np.where(new_key, starts - 1, 0)
        np.maximum.accumulate(key_base, out=key_base)
        return (starts - key_base).astype(np.int64)
    # rank: rn at tie-group starts, carried forward within the group.
    # Forward-fill by POSITION of the last tie-group start (positions are
    # globally nondecreasing, so max-accumulate is safe; rn values are
    # not — they reset to 1 at each key).
    idx = np.where(changed, np.arange(len(rn)), 0)
    np.maximum.accumulate(idx, out=idx)
    return rn[idx].astype(np.int64)


def window_rank(
    ds: Dataset,
    key_col: str,
    order_cols: Sequence[str],
    descending: Sequence[bool],
    carry_cols: Sequence[str] = (),
    method: str = "row_number",
    out_col: str = "rn",
    keep_top: int | None = None,
    num_parts: int | None = None,
    bytes_per_row: int = 48,
) -> Dataset:
    """ROW_NUMBER / RANK / DENSE_RANK per ``key_col`` in ``order_cols``
    order → input columns (key + order + carry) plus int64 ``out_col``;
    rows with ``out_col > keep_top`` are dropped when ``keep_top`` is set
    (the dedup-by-recency / top-k-per-group shape).

    ``row_number`` requires ``order_cols`` to be a TOTAL order within each
    key (end with a unique id) or the numbering is nondeterministic —
    same contract as sorting in SQL.
    """
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}: {method}")
    if len(order_cols) != len(descending):
        raise ValueError("order_cols and descending lengths differ")
    cols = [key_col, *order_cols]
    cols += [c for c in carry_cols if c not in cols]
    if num_parts is None:
        num_parts = dataset_num_parts(
            ds, bytes_per_row=bytes_per_row, target_bytes=32 << 20
        )
    impl = string_hash_impl()

    def add_part(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        return t.append_column(
            "part", key_part_column(t[key_col], num_parts, impl=impl)
        )

    ascending = [True] + [not d for d in descending]

    def kernel(t: pa.Table) -> pa.Table:
        out_fields = [*cols, out_col]
        if t.num_rows == 0 or key_col not in t.column_names:
            sch = pa.schema(
                [(c, t.schema.field(c).type) for c in cols]
                if t.num_rows or set(cols) <= set(t.column_names)
                else [(c, pa.int64()) for c in cols]
            )
            return sch.empty_table().append_column(
                out_col, pa.array([], pa.int64())
            )
        df = t.to_pandas()
        df = df.sort_values(
            [key_col, *order_cols], ascending=ascending, kind="stable"
        )
        ranks = _ranks_sorted(df, key_col, order_cols, method)
        df[out_col] = ranks
        if keep_top is not None:
            df = df[df[out_col] <= keep_top]
        out = pa.Table.from_pandas(df[out_fields], preserve_index=False)
        return out.set_column(
            out.column_names.index(out_col),
            out_col,
            out[out_col].cast(pa.int64()),
        )

    return hash_exchange(
        ds.map_batches(
            add_part,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        ),
        "part",
        kernel,
        num_parts,
    )


def window_lag(
    ds: Dataset,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    prev_col: str = "prev",
    delta_col: str | None = "delta",
    carry_cols: Sequence[str] = (),
    num_parts: int | None = None,
    bytes_per_row: int = 48,
) -> Dataset:
    """LAG(value) OVER (PARTITION BY key ORDER BY order_cols) — adds
    ``prev_col`` (null for each key's first row) and, when ``delta_col``
    is set, ``value - prev``. Value and outputs are int64 (nullable).
    """
    cols = [key_col, *order_cols]
    cols += [c for c in (value_col, *carry_cols) if c not in cols]
    if num_parts is None:
        num_parts = dataset_num_parts(
            ds, bytes_per_row=bytes_per_row, target_bytes=32 << 20
        )
    impl = string_hash_impl()

    def add_part(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        return t.append_column(
            "part", key_part_column(t[key_col], num_parts, impl=impl)
        )

    out_fields = [*cols, prev_col] + ([delta_col] if delta_col else [])

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            sch = pa.schema(
                [(c, t.schema.field(c).type) for c in cols]
                if set(cols) <= set(t.column_names)
                else [(c, pa.int64()) for c in cols]
            )
            out = sch.empty_table().append_column(
                prev_col, pa.array([], pa.int64())
            )
            if delta_col:
                out = out.append_column(delta_col, pa.array([], pa.int64()))
            return out
        df = t.to_pandas()
        df = df.sort_values(
            [key_col, *order_cols], ascending=True, kind="stable"
        )
        vals = df[value_col].to_numpy()
        first = df[key_col].ne(df[key_col].shift()).to_numpy()
        prev = np.empty_like(vals)
        prev[1:] = vals[:-1]
        prev[0] = 0
        valid = pa.array(~first)
        prev_arr = pc.if_else(
            valid,
            pa.array(prev.astype(np.int64)),
            pa.scalar(None, pa.int64()),
        )
        out = pa.Table.from_pandas(df[cols], preserve_index=False)
        out = out.append_column(prev_col, prev_arr)
        if delta_col:
            out = out.append_column(
                delta_col,
                pc.subtract(out[value_col].cast(pa.int64()), prev_arr),
            )
        return out.select(out_fields)

    return hash_exchange(
        ds.map_batches(
            add_part,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        ),
        "part",
        kernel,
        num_parts,
    )
