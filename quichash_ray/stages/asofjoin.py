"""Distributed as-of join: for every left row, attach the latest right row
with the same key and timestamp <= the left timestamp (backward, inclusive).

The classic training-data/event-enrichment primitive Ray Data lacks natively
(attribute a click to the most recent purchase, a log line to the most recent
deploy, a crawl snapshot to the most recent robots.txt fetch).

Shape: both sides are tagged with ``part = hash(key) % P`` and flow through
ONE :func:`quichash_ray.stages.exchange.hash_exchange` as a two-dataset
union; inside each partition the match is pandas ``merge_asof`` (C kernel,
sorted merge — no per-row Python). Partitioning assumption: all rows of a
key land in one partition (guaranteed by the key-hash part column); within a
partition the kernel sorts by timestamp, so input order is free.

Right-side ties on (key, ts) are broken BEFORE the merge: the row with the
greatest ``tiebreak_col`` wins, making the result deterministic (and
mirroring the ``QUALIFY row_number() ... ORDER BY tiebreak DESC = 1``
pre-dedup the SQL oracle applies). ``merge_asof`` alone would pick whichever
duplicate sorted last.

Scale notes: the exchange is the only data movement (single all-to-all on
the key hash, partition count derived from input size); the per-partition
merge is O(n log n) local work; no side is broadcast or driver-collected.

Reference analog: quichash has no joins beyond digest equality
(verify.rs:264-361); this generalizes the verify join discipline to
time-ordered enrichment as SURVEY §2 "custom operators" mandates.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from quichash_ray.stages.exchange import hash_exchange
from quichash_ray.stages.partitioning import (
    dataset_num_parts,
    key_part_column,
    string_hash_impl,
)


def asof_join(
    left: Dataset,
    right: Dataset,
    by: str,
    ts_col: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    tiebreak_col: str | None = None,
    num_parts: int | None = None,
) -> Dataset:
    """Backward-inclusive as-of join of ``left`` against ``right`` on
    ``by``/``ts_col``.

    Output columns: ``by``, ``ts_col``, every ``left_cols`` entry, then every
    ``right_cols`` entry (null where no right row precedes the left row).
    ``left_cols``/``right_cols`` must be disjoint from each other and from
    (by, ts_col); right payload columns keep their (nullable) types.
    """
    left_cols = list(left_cols)
    right_cols = list(right_cols)
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"left/right payload columns overlap: {overlap}")
    tiebreak = tiebreak_col or (right_cols[0] if right_cols else ts_col)

    lschema = left.schema()  # ray.data Schema: .names / .types (pyarrow)
    rschema = right.schema()
    ltype_map = dict(zip(lschema.names, lschema.types))
    rtype_map = dict(zip(rschema.names, rschema.types))
    by_type = ltype_map[by]
    ts_type = ltype_map[ts_col]
    ltypes = {c: ltype_map[c] for c in left_cols}
    rtypes = {c: rtype_map[c] for c in right_cols}

    if num_parts is None:
        num_parts = dataset_num_parts(
            left, bytes_per_row=64, target_bytes=32 << 20
        )
    # hash impl pinned on the driver so heterogeneous workers can't route
    # the same `by` key to different partitions (see string_hash_impl)
    hash_impl = string_hash_impl()

    def _pad(b: pa.Table, side: int) -> pa.Table:
        # identical column ORDER on both sides — the exchange unions them
        n = b.num_rows
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "part": key_part_column(b[by], num_parts, impl=hash_impl),
            "_side": pa.array(np.full(n, side, dtype=np.int8)),
            by: b[by],
            ts_col: b[ts_col],
        }
        for c in left_cols:
            cols[c] = b[c] if side == 0 else pa.nulls(n, ltypes[c])
        for c in right_cols:
            cols[c] = b[c] if side == 1 else pa.nulls(n, rtypes[c])
        return pa.table(cols)

    tagged_left = left.map_batches(
        lambda b: _pad(b, 0), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    tagged_right = right.map_batches(
        lambda b: _pad(b, 1), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    out_fields = (
        [(by, by_type), (ts_col, ts_type)]
        + [(c, ltypes[c]) for c in left_cols]
        + [(c, rtypes[c]) for c in right_cols]
    )

    def _empty() -> pa.Table:
        return pa.table({name: pa.nulls(0, t) for name, t in out_fields})

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty()
        import pandas as pd

        side = np.asarray(g["_side"].combine_chunks())
        df = g.drop_columns(["_side"]).to_pandas()
        ldf = df[side == 0][[by, ts_col] + left_cols]
        rdf = df[side == 1][[by, ts_col] + right_cols]
        if len(ldf) == 0:
            return _empty()
        # deterministic tie-break: greatest tiebreak_col per (by, ts) wins
        if len(rdf):
            rdf = (
                rdf.sort_values([by, ts_col, tiebreak])
                .drop_duplicates([by, ts_col], keep="last")
            )
        ldf = ldf.sort_values(ts_col, kind="mergesort")
        rdf = rdf.sort_values(ts_col, kind="mergesort")
        merged = pd.merge_asof(
            ldf,
            rdf,
            on=ts_col,
            by=by,
            direction="backward",
            allow_exact_matches=True,
        )
        arrays = []
        for name, t in out_fields:
            s = merged[name]
            if pa.types.is_integer(t) and s.dtype.kind == "f":
                # merge_asof upcasts missing ints to float NaN; restore
                # nullable int64 so the schema (and the oracle) stay exact
                arrays.append(pa.array(s.astype("Int64"), type=t))
            else:
                arrays.append(pa.array(s, type=t, from_pandas=True))
        return pa.table(dict(zip([n for n, _ in out_fields], arrays)))

    return hash_exchange(
        [tagged_left, tagged_right], "part", merge, num_parts
    )
