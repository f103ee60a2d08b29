"""Chunk-granularity dedup: chunk table shape, invariant, shared-chunk
signal between files whose file digests differ."""

from __future__ import annotations

import pyarrow as pa


def test_chunk_table_and_stats(ray_session):
    import ray.data

    from quichash_ray.pipelines.chunkdedup import (
        chunk_dedup_stats,
        chunk_digest_table,
    )

    shared = "X" * 64  # one exactly chunk-aligned shared block
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    shared + "tail one",
                    shared + "different tail",
                    "completely unrelated body",
                    None,
                ]
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    chunks = chunk_digest_table(ds, chunk_chars=64).to_pandas()
    # doc1: 2 chunks, doc2: 2 chunks, doc3: 1 chunk, doc4: none
    assert len(chunks) == 5
    assert (chunks["size"] <= 64).all()
    stats = chunk_dedup_stats(ds, chunk_chars=64).to_pandas().iloc[0]
    # docs 1 and 2 share the X-block chunk even though their file digests
    # differ — exactly the sub-file signal this operator exists for
    assert stats["total_files"] == 5
    assert stats["dup_groups"] == 1
    assert stats["dup_files"] == 2
    assert stats["wasted_bytes"] == 64
    assert (
        stats["unique_hashes"]
        == stats["total_files"] - stats["dup_files"] + stats["dup_groups"]
    )
