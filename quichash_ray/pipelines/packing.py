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
