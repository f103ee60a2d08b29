"""Exact-dup stage end-to-end over the synthetic corpus (SURVEY §7.0 slice)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pyarrow.parquet as pq
import pytest

from quichash_ray.pipelines.dedup import (
    analyze_stats,
    dedup_keep_first,
    digest_table,
    duplicate_groups,
)


@pytest.fixture(scope="module")
def corpus_digests(ray_session, corpus_dir):
    import ray.data

    ds = ray.data.read_parquet(f"{corpus_dir}/corpus")
    return digest_table(
        ds, content_col="content", key_cols=("row_id", "repo", "path")
    ).materialize()


@pytest.fixture(scope="module")
def brute_force(corpus_dir):
    """Driver-side dict grouping oracle (the reference's own structure,
    dedup.rs:440-446) — valid at test scale only."""
    t = pq.read_table(f"{corpus_dir}/corpus")
    groups = defaultdict(list)
    for rid, content in zip(
        t["row_id"].to_pylist(), t["content"].to_pylist()
    ):
        groups[hashlib.sha256(content.encode()).hexdigest()].append(rid)
    return t, groups


def test_row_count_preserved(corpus_digests, brute_force):
    t, _ = brute_force
    assert corpus_digests.count() == t.num_rows


def test_digests_match_brute_force(corpus_digests, brute_force):
    _, groups = brute_force
    got = corpus_digests.to_pandas()
    by_digest = defaultdict(list)
    for rid, dig in zip(got["row_id"], got["digest"]):
        by_digest[dig].append(rid)
    assert {k: sorted(v) for k, v in by_digest.items()} == {
        k: sorted(v) for k, v in groups.items()
    }


def test_content_sha256_invariant(ray_session, corpus_dir):
    """The per-row content-sha256 invariant asserted end-to-end
    (north_rule): digest column equals sha256 of the row's content."""
    import ray.data

    ds = ray.data.read_parquet(f"{corpus_dir}/corpus")
    with_digest = digest_table(
        ds, content_col="content", key_cols=("row_id",)
    )
    joined = with_digest.to_pandas().merge(
        pq.read_table(f"{corpus_dir}/corpus")
        .select(["row_id", "content"])
        .to_pandas(),
        on="row_id",
    )
    sample = joined.sample(n=200, random_state=0)
    for _, row in sample.iterrows():
        assert (
            row["digest"] == hashlib.sha256(row["content"].encode()).hexdigest()
        )
        assert row["size"] == len(row["content"].encode())


def test_duplicate_groups(corpus_digests, brute_force):
    _, groups = brute_force
    expected = {
        dig: rids for dig, rids in groups.items() if len(rids) > 1
    }
    got = duplicate_groups(corpus_digests, id_col="row_id").to_pandas()
    assert set(got["digest"]) == set(expected)
    for _, row in got.iterrows():
        rids = expected[row["digest"]]
        assert row["cnt"] == len(rids)
        assert row["rep"] == min(rids)
        assert row["wasted"] == (len(rids) - 1) * row["size"]
    # mega group present (corpus plants ≥1 group with many members)
    assert got["cnt"].max() >= 2


def test_dedup_keep_first(corpus_digests, brute_force):
    _, groups = brute_force
    got = dedup_keep_first(corpus_digests, id_col="row_id").to_pandas()
    assert len(got) == len(groups)
    expected_first = {d: min(r) for d, r in groups.items()}
    assert dict(zip(got["digest"], got["row_id"])) == expected_first


def test_analyze_stats_invariant(corpus_digests, brute_force):
    t, groups = brute_force
    stats = analyze_stats(corpus_digests).to_pandas().iloc[0]
    assert stats["total_files"] == t.num_rows
    assert stats["unique_hashes"] == len(groups)
    dup_groups = sum(1 for v in groups.values() if len(v) > 1)
    dup_files = sum(len(v) for v in groups.values() if len(v) > 1)
    assert stats["dup_groups"] == dup_groups
    assert stats["dup_files"] == dup_files
    # analyze.rs:262 invariant
    assert (
        stats["unique_hashes"]
        == stats["total_files"] - stats["dup_files"] + stats["dup_groups"]
    )


def test_unicode_paths_survive(ray_session, corpus_dir):
    """FIXTURES.md §4: every i18n path survives ingest→digest→groupby."""
    import ray.data

    ds = ray.data.read_parquet(f"{corpus_dir}/corpus")
    paths_in = {
        p
        for p in pq.read_table(f"{corpus_dir}/corpus")["path"].to_pylist()
        if p.startswith("i18n/")
    }
    assert paths_in  # fixture really plants them
    digested = digest_table(ds, key_cols=("path",))
    paths_out = {
        p
        for p in digested.to_pandas()["path"]
        if p.startswith("i18n/")
    }
    assert paths_out == paths_in
