"""Distributed interval (range) join: every left row pairs with EVERY
right-side interval of the same key that contains its timestamp
(``lo <= ts < hi``) — many-to-many, unlike the as-of join's latest-one.

The event-to-window enrichment primitive Ray Data lacks natively (attribute
events to incident windows, requests to deploy windows, crawl fetches to
robots.txt validity spans).

Shape (same discipline as :mod:`quichash_ray.stages.asofjoin`): both sides
tagged ``part = hash(key) % P`` and flowed through ONE
:func:`~quichash_ray.stages.exchange.hash_exchange` as a two-dataset union;
inside each partition the match is a vectorized banded sweep — intervals
sorted by ``lo``, and for each event only intervals with
``lo ∈ (ts − w, ts]`` are candidates, where ``w = max(hi − lo)`` within the
partition (any interval containing ts must start in that band). Candidate
pair emission is pure numpy (searchsorted bounds + repeat/arange), then the
exact ``hi > ts`` filter. No per-row Python.

Partitioning assumption: all rows of a key land in one partition (the
key-hash part column guarantees it). Skew/degeneracy note: the band width is
the partition's MAXIMUM interval width, so one pathologically wide interval
makes every event scan from it forward — callers with mixed-width intervals
should split giant intervals upstream (the same guidance DuckDB's IEJoin
literature gives). Null ``ts``/``lo``/``hi`` rows never join (SQL comparison
semantics).

Reference analog: quichash joins only on digest equality
(verify.rs:264-361); this extends the exchange discipline to range
predicates per SURVEY §2 "custom operators".
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from quichash_ray.stages.exchange import hash_exchange
from quichash_ray.stages.partitioning import (
    dataset_num_parts,
    key_part_column,
    string_hash_impl,
)


def interval_join(
    left: Dataset,
    intervals: Dataset,
    by: str,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    num_parts: int | None = None,
) -> Dataset:
    """Inner range join of ``left`` events against ``intervals`` on
    ``by`` with containment ``lo <= ts < hi``.

    Output columns: ``by``, ``ts_col``, every ``left_cols`` entry, then
    ``lo_col``, ``hi_col``, every ``right_cols`` entry — one row per
    matching (event, interval) pair. Column name sets must be disjoint.
    """
    left_cols = list(left_cols)
    right_cols = list(right_cols)
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"left/right payload columns overlap: {overlap}")

    lschema = left.schema()
    rschema = intervals.schema()
    ltype_map = dict(zip(lschema.names, lschema.types))
    rtype_map = dict(zip(rschema.names, rschema.types))
    by_type = ltype_map[by]
    ts_type = ltype_map[ts_col]
    lo_type = rtype_map[lo_col]
    hi_type = rtype_map[hi_col]
    ltypes = {c: ltype_map[c] for c in left_cols}
    rtypes = {c: rtype_map[c] for c in right_cols}

    if num_parts is None:
        num_parts = dataset_num_parts(
            left, bytes_per_row=64, target_bytes=32 << 20
        )
    hash_impl = string_hash_impl()

    def _pad(b: pa.Table, side: int) -> pa.Table:
        n = b.num_rows
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "part": key_part_column(b[by], num_parts, impl=hash_impl),
            "_side": pa.array(np.full(n, side, dtype=np.int8)),
            by: b[by],
            ts_col: b[ts_col] if side == 0 else pa.nulls(n, ts_type),
            lo_col: b[lo_col] if side == 1 else pa.nulls(n, lo_type),
            hi_col: b[hi_col] if side == 1 else pa.nulls(n, hi_type),
        }
        for c in left_cols:
            cols[c] = b[c] if side == 0 else pa.nulls(n, ltypes[c])
        for c in right_cols:
            cols[c] = b[c] if side == 1 else pa.nulls(n, rtypes[c])
        return pa.table(cols)

    tagged_left = left.map_batches(
        lambda b: _pad(b, 0), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    tagged_right = intervals.map_batches(
        lambda b: _pad(b, 1), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )

    out_fields = (
        [(by, by_type), (ts_col, ts_type)]
        + [(c, ltypes[c]) for c in left_cols]
        + [(lo_col, lo_type), (hi_col, hi_type)]
        + [(c, rtypes[c]) for c in right_cols]
    )

    def _empty() -> pa.Table:
        return pa.table({name: pa.nulls(0, t) for name, t in out_fields})

    def _as_i64(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return np.asarray(pc.cast(arr, pa.int64()))

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "_side" not in g.column_names:
            return _empty()
        side = np.asarray(g["_side"].combine_chunks())
        ev = g.filter(pa.array(side == 0))
        iv = g.filter(pa.array(side == 1))
        ev = ev.filter(pc.is_valid(ev[ts_col]))
        iv = iv.filter(
            pc.and_(pc.is_valid(iv[lo_col]), pc.is_valid(iv[hi_col]))
        )
        if ev.num_rows == 0 or iv.num_rows == 0:
            return _empty()

        # group by key WITHIN the partition: sort both sides by (key, time)
        # and sweep each key's contiguous segment independently — realized
        # by offsetting each key's interval positions into one global
        # sorted order (keys are co-partitioned, so this is exact).
        ev_key = _as_i64(ev[by]) if pa.types.is_integer(by_type) else None
        iv_key = _as_i64(iv[by]) if pa.types.is_integer(by_type) else None
        if ev_key is None:
            # string keys: factorize through a dict built from both sides
            import pandas as pd

            both = pd.concat(
                [ev[by].to_pandas(), iv[by].to_pandas()], ignore_index=True
            )
            codes, _ = pd.factorize(both, sort=True)
            ev_key = codes[: ev.num_rows].astype(np.int64)
            iv_key = codes[ev.num_rows :].astype(np.int64)

        ts = _as_i64(ev[ts_col])
        lo = _as_i64(iv[lo_col])
        hi = _as_i64(iv[hi_col])

        e_order = np.lexsort((ts, ev_key))
        i_order = np.lexsort((lo, iv_key))
        ev_key, ts = ev_key[e_order], ts[e_order]
        iv_key, lo, hi = iv_key[i_order], lo[i_order], hi[i_order]

        # banded sweep per key: any interval containing ts starts in
        # (ts − w, ts], w = max interval width in this partition
        w = int((hi - lo).max()) if len(lo) else 0
        if w <= 0:
            return _empty()
        # lex-rank by merge (fully vectorized, no per-event loop): the
        # number of intervals with (key, lo) ≤lex (qk, qv) is the query's
        # position in one lexsort of both sets minus the queries before it
        # — earlier keys cancel between the two bounds, so
        # [rank(ts−w), rank(ts)) is exactly {same key, ts−w < lo ≤ ts}
        def lex_rank(qv: np.ndarray) -> np.ndarray:
            m = len(lo)
            allk = np.concatenate([iv_key, ev_key])
            allv = np.concatenate([lo, qv])
            isq = np.concatenate(
                [np.zeros(m, np.int8), np.ones(len(qv), np.int8)]
            )  # query sorts AFTER an equal lo → side='right' semantics
            order = np.lexsort((isq, allv, allk))
            qmask = isq[order] == 1
            pos = np.nonzero(qmask)[0]
            queries_before = np.cumsum(qmask)[pos] - 1
            oq = order[pos] - m  # original query index at each sorted pos
            out = np.empty(len(qv), np.int64)
            out[oq] = pos - queries_before
            return out

        lo_start = lex_rank(ts - w)
        lo_end = lex_rank(ts)
        counts = lo_end - lo_start
        total = int(counts.sum())
        if total == 0:
            return _empty()
        ev_idx = np.repeat(np.arange(len(ts)), counts)
        iv_idx = (
            np.arange(total)
            - np.repeat(np.cumsum(counts) - counts, counts)
            + np.repeat(lo_start, counts)
        )
        keep = hi[iv_idx] > ts[ev_idx]
        ev_idx, iv_idx = ev_idx[keep], iv_idx[keep]
        if len(ev_idx) == 0:
            return _empty()

        ev_rows = ev.take(pa.array(e_order[ev_idx]))
        iv_rows = iv.take(pa.array(i_order[iv_idx]))
        cols = {by: ev_rows[by], ts_col: ev_rows[ts_col]}
        for c in left_cols:
            cols[c] = ev_rows[c]
        cols[lo_col] = iv_rows[lo_col]
        cols[hi_col] = iv_rows[hi_col]
        for c in right_cols:
            cols[c] = iv_rows[c]
        return pa.table(cols)

    return hash_exchange(
        [tagged_left, tagged_right], "part", merge, num_parts
    )
