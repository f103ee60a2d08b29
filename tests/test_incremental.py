"""Tiered incremental dedup: tier equivalence, bloom exactness under high
FP pressure, null/skip discipline, emit modes."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _mk_inputs(ray_session):
    import ray.data

    old_rows = pa.table(
        {
            "doc_id": pa.array(list(range(100)), pa.int64()),
            "text": pa.array(
                [f"old document number {i} body" for i in range(100)]
            ),
        }
    )
    # new shard: ids 0-49 duplicate old texts, 50-89 novel, 90-94 null
    new_rows = pa.table(
        {
            "doc_id": pa.array(list(range(200, 295)), pa.int64()),
            "text": pa.array(
                [f"old document number {i} body" for i in range(50)]
                + [f"brand new text {i}" for i in range(40)]
                + [None] * 5
            ),
        }
    )
    from quichash_ray.pipelines.dedup import digest_table

    old = digest_table(
        ray.data.from_arrow(old_rows), content_col="text",
        key_cols=("doc_id",),
    )
    new = ray.data.from_arrow(new_rows)
    return old, new


def _classified(ds) -> dict[int, str]:
    df = ds.to_pandas()
    return dict(zip(df["doc_id"], df["status"]))


EXPECT = (
    {200 + i: "dup" for i in range(50)}
    | {250 + i: "novel" for i in range(40)}
    | {290 + i: "novel" for i in range(5)}
)


@pytest.mark.parametrize("tier", ["broadcast", "bloom", "join"])
def test_tiers_agree_and_match_truth(ray_session, tier):
    from quichash_ray.pipelines.incremental import incremental_dedup

    old, new = _mk_inputs(ray_session)
    got = _classified(incremental_dedup(new, old, tier=tier))
    assert got == EXPECT


def test_bloom_false_positives_resolved_exactly(ray_session):
    """A 2^16-bit bloom over 100 keys with bits_per_key=1 forces heavy FP
    pressure structurally (tiny m floor keeps it honest); the exact-verify
    pass must still produce the truth table."""
    from quichash_ray.pipelines.incremental import incremental_dedup

    old, new = _mk_inputs(ray_session)
    got = _classified(
        incremental_dedup(new, old, tier="bloom", bits_per_key=1, num_hashes=1)
    )
    assert got == EXPECT


def test_bloom_positive_overflow_falls_to_join(ray_session):
    """positive_broadcast_limit=0 forces every bloom-positive batch over
    budget → the call must transparently take the join tier and stay
    exact."""
    from quichash_ray.pipelines.incremental import incremental_dedup

    old, new = _mk_inputs(ray_session)
    got = _classified(
        incremental_dedup(
            new, old, tier="bloom", positive_broadcast_limit=0
        )
    )
    assert got == EXPECT


@pytest.mark.parametrize("tier", ["broadcast", "bloom", "join"])
def test_emit_novel_rows(ray_session, tier):
    from quichash_ray.pipelines.incremental import incremental_dedup

    old, new = _mk_inputs(ray_session)
    out = incremental_dedup(new, old, tier=tier, emit="novel").to_pandas()
    assert set(out.columns) == {"doc_id", "text"}
    assert sorted(out["doc_id"]) == sorted(
        i for i, s in EXPECT.items() if s == "novel"
    )


def test_bloom_no_false_negatives_property(ray_session):
    """every old digest must test positive in the built bloom (bloom
    guarantee: negatives are exactly novel)."""
    import ray

    from quichash_ray.pipelines.incremental import (
        _hex_to_raw,
        _raw_to_u64_pair,
        _test_bits,
        build_bloom,
    )

    old, _ = _mk_inputs(ray_session)
    ref, m_bits, k = build_bloom(old)
    words = ray.get(ref)
    digs = old.to_pandas()["digest"].dropna().tolist()
    raw = _hex_to_raw(pa.array(digs))
    h1, h2 = _raw_to_u64_pair(raw)
    hit = _test_bits(words, h1, h2, k, np.uint64(m_bits - 1))
    assert hit.all()


def test_hex_to_raw_roundtrip():
    import hashlib

    from quichash_ray.pipelines.incremental import _hex_to_raw

    digs = [hashlib.sha256(str(i).encode()).digest() for i in range(64)]
    hexes = pa.array([d.hex() for d in digs])
    raw = _hex_to_raw(hexes)
    assert [raw[i].tobytes() for i in range(64)] == digs
