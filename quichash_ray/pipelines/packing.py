"""Sequence packing plan — map every document into the fixed-length
training sequences a GPT-style loader would emit after concatenating the
token stream in id order and chopping it into ``ctx_len`` windows.

Output per document: ``(id, n_tokens, start_tok, first_seq, last_seq,
n_seqs)`` — its global token offset and the range of context windows it
spans. This is the deterministic "where does my data land" plan that
epoch-reproducible training, data attribution, and loss-masking audits
need; all-integer so oracle comparison is exact.

The global token offset is a distributed exclusive prefix sum:

1. one streaming pass projects ``(id, n_tokens)`` (16 B/row — content
   never leaves the map stage);
2. the projection is range-sorted on id (Ray Data's sample-based sort —
   the one genuinely order-defining shuffle the semantics require);
3. per-block token sums are computed remotely; the DRIVER sees only the
   B per-block ``(min_id, max_id, sum)`` triples, orders blocks by range
   (asserting they don't overlap — duplicate ids across blocks would make
   the offset ill-defined), and computes B exclusive offsets;
4. one remote task per block emits the final rows from a local cumsum +
   its block offset (``ray.data.from_arrow_refs`` re-enters the Dataset
   world without driver materialization).

Driver traffic is O(blocks), worker memory O(block) — the textbook
two-phase scan shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from quichash_ray.functions.text import token_count_array


def _assert_disjoint_ranges(stats: list[tuple[int, int, int]]) -> None:
    """stats = (min_id, max_id, sum) per block, sorted by min_id. A
    cross-block id overlap means duplicate ids, making the global offset
    ill-defined — refuse rather than pick an arbitrary order. (Duplicates
    WITHIN one block are ordered by the stable local sort, but the id
    contract everywhere in this engine is uniqueness.)"""
    for a, b in zip(stats, stats[1:]):
        if a[1] >= b[0]:
            raise ValueError(
                "pack_sequences requires globally unique ids: block id "
                f"ranges overlap ({a[:2]} vs {b[:2]})"
            )


def pack_sequences(
    ds: Dataset,
    ctx_len: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """→ (id, n_tokens, start_tok, first_seq, last_seq, n_seqs) per doc
    with ≥1 whitespace token (null/empty docs contribute nothing to the
    stream, the skip-and-count discipline). Requires unique ids."""
    import ray
    import ray.data

    if ctx_len <= 0:
        raise ValueError(f"ctx_len must be positive, got {ctx_len}")

    def project(b: pa.Table) -> pa.Table:
        n = token_count_array(b[text_col])
        t = pa.table({id_col: b[id_col], "n_tokens": n})
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t["n_tokens"], 1))

    proj = ds.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).sort(id_col)

    @ray.remote
    def block_stats(tbl: pa.Table):
        if tbl.num_rows == 0:
            return None
        ids = np.asarray(tbl[id_col], np.int64)
        return int(ids.min()), int(ids.max()), int(
            np.asarray(tbl["n_tokens"], np.int64).sum()
        )

    refs = proj.to_arrow_refs()
    stats = ray.get([block_stats.remote(r) for r in refs])
    live = [(s, r) for s, r in zip(stats, refs) if s is not None]
    live.sort(key=lambda sr: sr[0][0])
    _assert_disjoint_ranges([s for s, _ in live])
    offsets = np.concatenate(
        ([0], np.cumsum([s[2] for s, _ in live])[:-1])
    ) if live else np.empty(0, np.int64)

    @ray.remote
    def finish(tbl: pa.Table, offset: int) -> pa.Table:
        order = np.argsort(np.asarray(tbl[id_col], np.int64), kind="stable")
        ids = np.asarray(tbl[id_col], np.int64)[order]
        n = np.asarray(tbl["n_tokens"], np.int64)[order]
        start = offset + np.concatenate(([0], np.cumsum(n)[:-1]))
        first = start // ctx_len
        last = (start + n - 1) // ctx_len
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_tokens": pa.array(n),
                "start_tok": pa.array(start),
                "first_seq": pa.array(first),
                "last_seq": pa.array(last),
                "n_seqs": pa.array(last - first + 1),
            }
        )

    if not live:
        return ray.data.from_arrow(
            pa.schema(
                [
                    (id_col, pa.int64()),
                    ("n_tokens", pa.int64()),
                    ("start_tok", pa.int64()),
                    ("first_seq", pa.int64()),
                    ("last_seq", pa.int64()),
                    ("n_seqs", pa.int64()),
                ]
            ).empty_table()
        )
    out_refs = [
        finish.remote(r, int(off))
        for (_, r), off in zip(live, offsets)
    ]
    return ray.data.from_arrow_refs(out_refs)


def chunk_documents(
    ds,
    max_tok: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Split every document into consecutive ``max_tok``-token training
    windows — the context-window preparation step (each chunk becomes
    one training example). → (doc_id, chunk_idx, chunk_text, n_tok).

    Fully vectorized and shuffle-free: texts are whitespace-trimmed once
    so the RE2 split yields clean token lists, then ``pc.list_slice`` +
    ``pc.binary_join`` run once per chunk INDEX (the loop is over chunk
    positions ≤ ceil(max_doc_len / max_tok), never over rows or
    tokens) — O(total_tokens) per batch regardless of document count.
    The SQL oracle mirrors the slicing with 1-based inclusive bounds.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
                "n_tok": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        text = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray
        ) else b[text_col]
        ids = b[id_col].combine_chunks() if isinstance(
            b[id_col], pa.ChunkedArray
        ) else b[id_col]
        n = pc.cast(
            pc.count_substring_regex(text, pattern=r"[^ \t\n\f\r]+"),
            pa.int64(),
        )
        has_any = pc.fill_null(pc.greater(n, pa.scalar(0, pa.int64())), False)
        text = text.filter(has_any)
        ids = ids.filter(has_any)
        n = n.filter(has_any)
        if len(ids) == 0:
            return empty
        # trimmed text splits into clean token lists (no edge empties;
        # interior whitespace runs are single separators)
        lists = pc.split_pattern_regex(
            pc.utf8_trim(text, characters=" \t\n\f\r"),
            pattern=r"[ \t\n\f\r]+",
        )
        max_n = pc.max(n).as_py()
        outs = []
        ci = 0
        while ci * max_tok < max_n:
            has = pc.greater(n, pa.scalar(ci * max_tok, pa.int64()))
            sl = lists.filter(has)
            sid = ids.filter(has)
            sn = n.filter(has)
            sliced = pc.list_slice(
                sl, start=ci * max_tok, stop=(ci + 1) * max_tok
            )
            outs.append(
                pa.table(
                    {
                        id_col: pc.cast(sid, pa.int64()),
                        "chunk_idx": pa.array(
                            [ci] * len(sid), pa.int64()
                        ),
                        "chunk_text": pc.binary_join(
                            sliced, pa.scalar(" ")
                        ),
                        "n_tok": pc.min_element_wise(
                            pc.subtract(
                                sn, pa.scalar(ci * max_tok, pa.int64())
                            ),
                            pa.scalar(max_tok, pa.int64()),
                        ),
                    }
                )
            )
            ci += 1
        return pa.concat_tables(outs) if outs else empty

    return ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
