"""Chunk-granularity dedup: chunk table shape, invariant, shared-chunk
signal between files whose file digests differ; gear CDC properties."""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa

from quichash_ray.pipelines.chunkdedup import _GEAR, gear_boundaries


def _salad(rng, n_words: int) -> bytes:
    return (
        " ".join(f"tok{rng.randrange(500)}" for _ in range(n_words))
    ).encode()


def test_gear_matches_sequential_reference():
    rng = random.Random(7)
    for trial in range(30):
        data = bytes(
            rng.randrange(256) for _ in range(rng.randrange(0, 300))
        )
        h = 0
        cuts = []
        for t, byte in enumerate(data):
            h = ((h << 1) + int(_GEAR[byte])) & 0xFFFFFFFFFFFFFFFF
            if (h >> 58) == 0:  # mask_bits=6
                cuts.append(t + 1)
        if not cuts or cuts[-1] != len(data):
            cuts.append(len(data))
        assert gear_boundaries(data, 6).tolist() == cuts, trial


def test_gear_chunk_size_and_insertion_robustness():
    rng = random.Random(5)
    body = _salad(rng, 400)
    cuts = gear_boundaries(body, 6)
    sizes = np.diff(np.concatenate(([0], cuts)))
    assert 30 <= sizes.mean() <= 130  # expected ~2^6

    def digs(data):
        out, s = set(), 0
        for e in gear_boundaries(data, 6):
            out.add(hashlib.sha256(data[s:e]).hexdigest())
            s = e
        return out

    a = digs(body)
    b = digs(b"PREFIX-INSERTED-" + body)
    # content-defined: nearly all chunks survive a prefix insertion...
    assert len(a & b) >= 0.8 * len(a)
    # ...which is exactly what fixed-size chunking cannot do
    fixed_a = {
        hashlib.sha256(body[i : i + 64]).hexdigest()
        for i in range(0, len(body), 64)
    }
    shifted = b"PREFIX-INSERTED-" + body
    fixed_b = {
        hashlib.sha256(shifted[i : i + 64]).hexdigest()
        for i in range(0, len(shifted), 64)
    }
    assert len(fixed_a & fixed_b) <= 1


def test_cdc_stats_pipeline(ray_session):
    import ray.data

    from quichash_ray.pipelines.chunkdedup import cdc_dedup_stats

    rng = random.Random(9)
    body = _salad(rng, 300).decode()
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([body, "PREFIX-INSERTED- " + body]),
        }
    )
    stats = (
        cdc_dedup_stats(ray.data.from_arrow(t), mask_bits=6)
        .to_pandas()
        .iloc[0]
    )
    # the shared body dedups at chunk level despite the shifted prefix
    assert stats["dup_groups"] > 10
    assert (
        stats["unique_hashes"]
        == stats["total_files"] - stats["dup_files"] + stats["dup_groups"]
    )


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
