"""Normalized (canonical-text) exact dedup — the C4/CCNet-style tier between
byte-exact dedup and fuzzy MinHash: documents that differ only in case,
punctuation, or whitespace collapse to one canonical form and dedup exactly
on its digest.

Canonicalization (mirrored bit-for-bit by the DuckDB oracle, both RE2):

    lower(text) → strip non-[a-z0-9 \\t\\n\\f\\r] runs to ' '
                → collapse whitespace runs to ' ' → trim spaces

Pipeline shape: one stateless vectorized map_batches (two RE2 passes +
utf8proc lowercase + md5 over zero-copy views — the digest-stage
discipline) → groupby(digest) Count/Min — the same one-shuffle
combiner-backed aggregate as exact dedup; content never shuffles, only
(digest, doc_id) rows.

Reference parity: quichash has no normalization tier (its dedup is
byte-exact, ``dedup.rs``); this is one of the graft-mandated
training-data operators (C4: Raffel et al. 2020, §2.2 cleanup).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Min

# canonicalization pattern pair — keep in lockstep with the oracle SQL in
# __ray_entry__ ("normalized_dedup") and with tests/test_round4_ops.py
_STRIP_RE = r"[^a-z0-9 \t\n\f\r]+"
_WS_RE = r"[ \t\n\f\r]+"


def canonical_text(text: pa.ChunkedArray | pa.Array):
    """Vectorized canonical form of a string column (nulls propagate)."""
    return pc.utf8_trim(
        pc.replace_substring_regex(
            pc.replace_substring_regex(
                pc.utf8_lower(text), pattern=_STRIP_RE, replacement=" "
            ),
            pattern=_WS_RE,
            replacement=" ",
        ),
        characters=" ",
    )


def normalized_digests(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """→ (id, digest): md5 hex of the canonical text; null text → no row
    (matching the oracle's WHERE text IS NOT NULL)."""

    def kernel(b: pa.Table) -> pa.Table:
        from quichash_ray.stages.digest import content_byte_views

        canon = canonical_text(b[text_col])
        views, _ = content_byte_views(pa.table({"t": canon}), "t")
        ids = b[id_col].combine_chunks() if isinstance(
            b[id_col], pa.ChunkedArray
        ) else b[id_col]
        out_ids, out_dg = [], []
        for rid, v in zip(ids.to_pylist(), views):
            if v is None:
                continue
            out_ids.append(rid)
            out_dg.append(hashlib.md5(v).hexdigest())
        return pa.table(
            {
                id_col: pa.array(out_ids, pa.int64()),
                "digest": pa.array(out_dg, pa.string()),
            }
        )

    return ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def normalized_dup_groups(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """→ (digest, cnt, rep): canonical-form duplicate groups (cnt ≥ 2),
    rep = smallest member id. One shuffle, digest+id rows only."""
    dg = normalized_digests(ds, id_col, text_col)
    agg = dg.groupby("digest").aggregate(
        Count(alias_name="cnt"), Min(id_col, alias_name="rep")
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "cnt" not in b.column_names:
            return pa.table(
                {
                    "digest": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "rep": pa.array([], pa.int64()),
                }
            )
        t = pa.table(
            {
                "digest": b["digest"],
                "cnt": pc.cast(b["cnt"], pa.int64()),
                "rep": pc.cast(b["rep"], pa.int64()),
            }
        )
        return t.filter(pc.greater_equal(t["cnt"], pa.scalar(2, pa.int64())))

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


# argmax packing for keep-best: key = len << 40 | (ID_MASK - id).
# Max(key) picks the longest member; among equal lengths the SMALLEST id
# (ID_MASK - id maximal). len clamped to 23 bits so key fits int64 with
# ids < 2^40 — mirrored bit-for-bit by the SQL oracle.
_ID_MASK = (1 << 40) - 1
_LEN_CAP = (1 << 23) - 1


def normalized_keep_best(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """Quality-aware normalized dedup: one row per canonical-text group,
    keeping the LONGEST member (most complete variant), ties broken by
    smallest id — the C4-style "keep the best copy" discipline rather
    than keep-first. → (digest, cnt, keep_id, keep_len).

    Shape: one vectorized canonicalize+digest pass (content never
    shuffles), then a single groupby(digest) Count/Max over an
    int64-packed (len, id) argmax key — same one-shuffle combiner
    aggregate as :func:`normalized_dup_groups`; the argmax needs no
    second join-back pass because the winner id rides inside the key.
    """
    from ray.data.aggregate import Count, Max

    def kernel(b: pa.Table) -> pa.Table:
        import hashlib

        from quichash_ray.stages.digest import content_byte_views

        canon = canonical_text(b[text_col])
        views, _ = content_byte_views(pa.table({"t": canon}), "t")
        lens = pc.min_element_wise(
            pc.cast(pc.utf8_length(b[text_col]), pa.int64()),
            pa.scalar(_LEN_CAP, pa.int64()),
        )
        ids = b[id_col].combine_chunks() if isinstance(
            b[id_col], pa.ChunkedArray
        ) else b[id_col]
        out_dg, out_key = [], []
        for rid, ln, v in zip(
            ids.to_pylist(), lens.to_pylist(), views
        ):
            if v is None:
                continue
            out_dg.append(hashlib.md5(v).hexdigest())
            out_key.append((ln << 40) | (_ID_MASK - rid))
        return pa.table(
            {
                "digest": pa.array(out_dg, pa.string()),
                "key": pa.array(out_key, pa.int64()),
            }
        )

    keyed = ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = keyed.groupby("digest").aggregate(
        Count(alias_name="cnt"), Max("key", alias_name="best")
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "best" not in b.column_names:
            return pa.table(
                {
                    "digest": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "keep_id": pa.array([], pa.int64()),
                    "keep_len": pa.array([], pa.int64()),
                }
            )
        best = pc.cast(b["best"], pa.int64())
        return pa.table(
            {
                "digest": b["digest"],
                "cnt": pc.cast(b["cnt"], pa.int64()),
                "keep_id": pc.subtract(
                    pa.scalar(_ID_MASK, pa.int64()),
                    pc.bit_wise_and(best, pa.scalar(_ID_MASK, pa.int64())),
                ),
                "keep_len": pc.shift_right(best, pa.scalar(40, pa.int64())),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)
