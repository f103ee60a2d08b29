"""Line-granularity dedup over an (id, text) table: within-document
duplicate-line stats and cross-corpus boilerplate-line removal (the
C4/CCNet-style cleaning step — drop lines that appear in a large share of
documents: copyright footers, cookie banners, nav chrome).

Two operators:

- :func:`line_stats` — per-doc line counts / distinct-line counts /
  duplicate-line basis points. One streaming pass, zero shuffles; the
  per-doc distinct count runs through a pandas groupby-nunique C kernel
  over the flattened split values (no per-row Python).

- :func:`boilerplate_removal` — two passes joined by ONE small shuffle:
  (1) per-batch partial doc-frequency counts per line (lines deduped
  within doc before counting, so df = #docs containing the line) →
  ``groupby(line).sum`` — the combiner pattern, the shuffle carries only
  (line, partial_count); (2) the common-line set (df ≥ pct% of docs) is
  broadcast via ``ray.put`` and each doc filters its lines vectorized
  (pandas ``isin`` hash probe) and rejoins survivors.

  The broadcast is provably bounded: every common line has df ≥
  pct·N/100, and Σdf over lines ≤ total line instances L, so
  |common| ≤ 100·(L/N)/pct = (100/pct)·avg_lines_per_doc — independent
  of corpus size N. No cap, no driver materialization of anything
  unbounded.

Reference analog: none (quichash is file-granularity); graft-mandate
training-data hygiene operator. Oracle: ``__ray_entry__.oracle_sql()``
mirrors both operators in DuckDB (string_split + unnest + window-free
aggregation), hash-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def _drop_null_text(b: pa.Table, text_col: str) -> pa.Table:
    """Null-text docs are SKIPPED (no output row) by every operator here —
    the contract that matches the oracle, where ``unnest(string_split(NULL))``
    yields no row. Emitting zero-rows for nulls (the pre-round-4 behavior)
    silently diverged from the SQL on any corpus with nulls."""
    if b.num_rows and b[text_col].null_count:
        return b.filter(pc.is_valid(b[text_col]))
    return b


def _split_lines(b: pa.Table, text_col: str) -> pa.ListArray:
    text = b[text_col].combine_chunks() if isinstance(
        b[text_col], pa.ChunkedArray
    ) else b[text_col]
    lists = pc.split_pattern(text, pattern="\n")
    return lists.combine_chunks() if isinstance(
        lists, pa.ChunkedArray
    ) else lists


def line_stats(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """→ (id, n_lines, n_distinct_lines, dup_line_bp). Null-text docs are
    dropped, matching the oracle (len(NULL) is NULL in SQL, not 0)."""

    def kernel(b: pa.Table) -> pa.Table:
        b = _drop_null_text(b, text_col)
        lists = _split_lines(b, text_col)
        offsets = np.asarray(lists.offsets)
        n_lines = np.diff(offsets).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(n_lines)), n_lines)
        vals = lists.flatten()
        distinct = np.zeros(len(n_lines), dtype=np.int64)
        if len(vals):
            nd = (
                pd.Series(vals.to_pandas().values)
                .groupby(doc_idx)
                .nunique()
            )
            distinct[nd.index.to_numpy()] = nd.to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            dup_bp = np.where(
                n_lines > 0,
                (10000 * (n_lines - distinct)) // np.maximum(n_lines, 1),
                0,
            )
        return pa.table(
            {
                id_col: b[id_col],
                "n_lines": pa.array(n_lines),
                "n_distinct_lines": pa.array(distinct),
                "dup_line_bp": pa.array(dup_bp.astype(np.int64)),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def common_lines(
    ds: Dataset, n_docs: int, pct: int = 5, text_col: str = "text"
) -> list[str]:
    """Lines whose doc-frequency (distinct docs containing the line) is
    ≥ pct% of ``n_docs``. Returns the (provably bounded) sorted list."""

    def partial(b: pa.Table) -> pa.Table:
        b = _drop_null_text(b, text_col)
        lists = _split_lines(b, text_col)
        offsets = np.asarray(lists.offsets)
        n_lines = np.diff(offsets)
        doc_idx = np.repeat(np.arange(len(n_lines)), n_lines)
        vals = lists.flatten()
        if len(vals) == 0:
            return pa.table(
                {"line": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        df = pd.DataFrame(
            {"i": doc_idx, "line": vals.to_pandas().values}
        ).drop_duplicates()  # df counts DOCS, not occurrences
        vc = df["line"].value_counts()
        return pa.table(
            {
                "line": pa.array(vc.index.to_numpy(), pa.string()),
                "cnt": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    dfreq = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).groupby("line").sum("cnt")
    threshold = int(pct) * int(n_docs)  # df*100 >= pct*n_docs, integers

    def hot_only(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(cnt)" not in b.column_names:
            return pa.table({"line": pa.array([], pa.string())})
        mask = pc.greater_equal(
            pc.multiply(pc.cast(b["sum(cnt)"], pa.int64()), pa.scalar(100)),
            pa.scalar(threshold),
        )
        return pa.table({"line": b.filter(mask)["line"]})

    hot = dfreq.map_batches(hot_only, batch_format="pyarrow", batch_size=None)
    # bounded by (100/pct) * avg_lines_per_doc — see module docstring
    return sorted(r["line"] for r in hot.take_all())


def boilerplate_removal(
    ds: Dataset,
    n_docs: int,
    pct: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """→ (id, n_lines, n_removed, clean_text): each doc with corpus-common
    lines (df ≥ pct% of docs) dropped, survivors rejoined with newlines."""
    common_ref = ray.put(np.array(common_lines(ds, n_docs, pct, text_col)))

    def scrub(b: pa.Table) -> pa.Table:
        from quichash_ray.stages.broadcast import cached_get

        common = cached_get(common_ref)
        b = _drop_null_text(b, text_col)
        lists = _split_lines(b, text_col)
        offsets = np.asarray(lists.offsets)
        n_lines = np.diff(offsets).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(n_lines)), n_lines)
        flat = lists.flatten()  # values in slice order, matching doc_idx
        vals = flat.to_pandas().values
        drop = pd.Series(vals).isin(common).to_numpy()
        n_removed = np.zeros(len(n_lines), dtype=np.int64)
        if drop.any():
            np.add.at(n_removed, doc_idx[drop], 1)
        # vectorized rejoin: rebuild a list array over the surviving lines
        # and C-join with "\n" — no per-doc Python loop
        new_offsets = np.zeros(len(n_lines) + 1, dtype=np.int64)
        np.cumsum(n_lines - n_removed, out=new_offsets[1:])
        clean_lists = pa.LargeListArray.from_arrays(
            pa.array(new_offsets, pa.int64()),
            flat.filter(pa.array(~drop)),
        )
        # separator must match the list value type — (large_list<large_string>,
        # string) has no binary_join kernel, so scalar-cast the separator
        clean = pc.binary_join(
            clean_lists, pa.scalar("\n", clean_lists.type.value_type)
        )
        return pa.table(
            {
                id_col: b[id_col],
                "n_lines": pa.array(n_lines),
                "n_removed": pa.array(n_removed),
                "clean_text": pc.cast(clean, pa.string()),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
