"""Fuzzy dedup: MinHash/LSH + SimHash + clustering vs brute-force oracles.

Recall target (BASELINE.json): dup-pair recall ≥ 0.99. Measured here on the
synthetic corpus truth sidecar: all pairs the truth puts in one cluster
(exact dups trivially, near dups whose true Jaccard ≥ the verify threshold)
must land in one predicted cluster.
"""

from __future__ import annotations

import itertools
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq
import pytest

from quichash_ray.config import FuzzyConfig
from quichash_ray.pipelines.fuzzy import fuzzy_dedup
from quichash_ray.pipelines.ngram import gram_hashes
from quichash_ray.stages.unionfind import driver_union_find


@pytest.fixture(scope="module")
def corpus_tables(corpus_dir):
    corpus = pq.read_table(f"{corpus_dir}/corpus")
    truth = pq.read_table(f"{corpus_dir}/truth")
    return corpus, truth


@pytest.fixture(scope="module")
def clusters(ray_session, corpus_dir):
    import ray.data

    ds = ray.data.read_parquet(f"{corpus_dir}/corpus")
    out = fuzzy_dedup(ds).to_pandas()
    return dict(zip(out["row_id"], out["cluster_id"]))


def _true_pairs(corpus, truth, cfg: FuzzyConfig):
    """Ground-truth same-cluster pairs that the pipeline is REQUIRED to find:
    truth-cluster pairs whose exact Jaccard ≥ verify threshold (exact dups
    have J=1; near dups are planted above it — asserted here too)."""
    shingles = {}
    for rid, text in zip(
        corpus["row_id"].to_pylist(), corpus["content"].to_pylist()
    ):
        shingles[rid] = gram_hashes(text.split(), cfg.shingle_k)
    by_cluster = defaultdict(list)
    for rid, cid in zip(
        truth["row_id"].to_pylist(), truth["cluster_id"].to_pylist()
    ):
        by_cluster[cid].append(rid)
    required = []
    skipped_low_j = 0
    for members in by_cluster.values():
        if len(members) < 2:
            continue
        for a, b in itertools.combinations(sorted(members), 2):
            sa, sb = shingles[a], shingles[b]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            if j >= cfg.jaccard_threshold:
                required.append((a, b))
            else:
                skipped_low_j += 1
    return required, skipped_low_j


def test_recall_ge_099(clusters, corpus_tables):
    corpus, truth = corpus_tables
    cfg = FuzzyConfig()
    required, skipped = _true_pairs(corpus, truth, cfg)
    assert len(required) > 50  # the corpus really plants work
    # planted near-dups overwhelmingly land above the verify threshold
    assert skipped < len(required) * 0.2
    found = sum(
        1 for a, b in required if clusters[a] == clusters[b]
    )
    recall = found / len(required)
    assert recall >= 0.99, f"recall {recall:.4f} on {len(required)} pairs"


def test_low_sim_not_clustered(clusters, corpus_tables):
    """FIXTURES.md §1: Jaccard 0.5-0.7 plants must NOT cluster (b=16/r=8
    + 0.8 verification)."""
    corpus, truth = corpus_tables
    low = [
        rid
        for rid, kind in zip(
            truth["row_id"].to_pylist(), truth["kind"].to_pylist()
        )
        if kind == "low_sim"
    ]
    assert low
    for rid in low:
        base = rid - 8
        if base in clusters:
            assert clusters[rid] != clusters[base], f"low_sim {rid} clustered"


def test_precision_no_false_merges(clusters, corpus_tables):
    """Predicted same-cluster pairs must be genuinely similar: every pair in
    a predicted cluster has true Jaccard ≥ threshold (verification is exact,
    so precision should be 1.0 up to shingle-hash collisions)."""
    corpus, truth = corpus_tables
    cfg = FuzzyConfig()
    shingles = {}
    for rid, text in zip(
        corpus["row_id"].to_pylist(), corpus["content"].to_pylist()
    ):
        shingles[rid] = gram_hashes(text.split(), cfg.shingle_k)
    by_pred = defaultdict(list)
    for rid, cid in clusters.items():
        by_pred[cid].append(rid)
    checked = 0
    for members in by_pred.values():
        if len(members) < 2 or len(members) > 300:
            continue
        for a, b in itertools.combinations(sorted(members)[:25], 2):
            sa, sb = shingles[a], shingles[b]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 1.0
            # connected components may chain: allow transitive closure slack
            assert j >= 0.5, f"pair ({a},{b}) merged with J={j:.2f}"
            checked += 1
    assert checked > 20


def test_exact_dups_same_cluster(clusters, corpus_tables):
    corpus, truth = corpus_tables
    kinds = dict(
        zip(truth["row_id"].to_pylist(), truth["kind"].to_pylist())
    )
    tcid = dict(
        zip(truth["row_id"].to_pylist(), truth["cluster_id"].to_pylist())
    )
    for rid, kind in kinds.items():
        if kind in ("exact_dup", "moved", "mega"):
            assert clusters[rid] == clusters[tcid[rid]]


def test_driver_union_find():
    edges = [(1, 2), (2, 3), (10, 11), (5, 5)]
    lab = driver_union_find(edges)
    assert lab[1] == lab[2] == lab[3] == 1
    assert lab[10] == lab[11] == 10


def test_hashmin_equals_driver(ray_session):
    """Distributed hash-min CC ≡ exact union-find on a chain + stars graph."""
    import pyarrow as pa
    import ray.data

    from quichash_ray.stages.unionfind import connected_components

    edges = (
        [(i, i + 1) for i in range(0, 20)]          # chain 0..20
        + [(100, x) for x in range(101, 110)]        # star
        + [(200, 201), (202, 203), (201, 202)]       # merged pairs
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([e[0] for e in edges], pa.int64()),
                "id_b": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    exact = {
        r["node"]: r["cluster_id"]
        for r in connected_components(ds, method="driver").take_all()
    }
    dist = {
        r["node"]: r["cluster_id"]
        for r in connected_components(ds, method="hashmin").take_all()
    }
    assert exact == dist
    assert dist[20] == 0 and dist[109] == 100 and dist[203] == 200


def test_distributed_verify_equals_broadcast(ray_session, corpus_dir):
    """The co-partitioned two-tier verifier yields the same clusters as the
    broadcast exact verifier on the planted corpus."""
    import ray.data

    ds = ray.data.read_parquet(f"{corpus_dir}/corpus")
    a = fuzzy_dedup(ds, verify_mode="broadcast").to_pandas()
    b = fuzzy_dedup(ds, verify_mode="distributed").to_pandas()
    ca = dict(zip(a["row_id"], a["cluster_id"]))
    cb = dict(zip(b["row_id"], b["cluster_id"]))
    assert ca == cb


def test_all_unique_corpus_no_crash(ray_session):
    """Regression: empty edge set (no near-dups) must not crash the
    label-attach broadcast (empty-mapping IndexError, found in review)."""
    import pyarrow as pa
    import ray.data

    t = pa.table(
        {
            "row_id": pa.array(range(30), pa.int64()),
            "content": pa.array(
                [
                    " ".join(f"uniq{i}_{j}" for j in range(20))
                    for i in range(30)
                ],
                pa.large_string(),
            ),
        }
    )
    out = fuzzy_dedup(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 30
    assert (out["cluster_id"] == out["row_id"]).all()


def test_null_content_rows_skipped(ray_session):
    """Regression: null content → null digest rows are excluded from
    grouping (skip-and-count), not a crash."""
    import pyarrow as pa
    import ray.data

    from quichash_ray.pipelines.dedup import digest_table, duplicate_groups

    t = pa.table(
        {
            "path": pa.array(["a", "b", "c", "d"], pa.string()),
            "content": pa.array(["x y z", None, "x y z", None], pa.large_string()),
        }
    )
    digests = digest_table(ray.data.from_arrow(t))
    groups = duplicate_groups(digests).to_pandas()
    assert len(groups) == 1 and groups.iloc[0]["cnt"] == 2

    out = fuzzy_dedup(
        ray.data.from_arrow(
            pa.table(
                {
                    "row_id": pa.array([1, 2, 3], pa.int64()),
                    "content": pa.array(
                        ["p q r s t u v w", None, "p q r s t u v w"],
                        pa.large_string(),
                    ),
                }
            )
        )
    ).to_pandas()
    got = dict(zip(out["row_id"], out["cluster_id"]))
    assert got[1] == got[3] == 1


def test_short_docs_not_banded(ray_session):
    """Regression: docs with < k tokens share the identity signature; they
    must not flood LSH buckets (distinct short docs stay unclustered)."""
    import pyarrow as pa
    import ray.data

    t = pa.table(
        {
            "row_id": pa.array(range(10), pa.int64()),
            "content": pa.array(
                [f"w{i} x{i}" for i in range(10)], pa.large_string()
            ),
        }
    )
    out = fuzzy_dedup(ray.data.from_arrow(t)).to_pandas()
    assert (out["cluster_id"] == out["row_id"]).all()
