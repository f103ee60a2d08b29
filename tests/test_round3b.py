"""Round-3b operators: as-of join, PII scrub, line dedup, vocab top-k."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(table: pa.Table, blocks: int = 2):
    import ray.data

    return ray.data.from_arrow(table).repartition(blocks)


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def test_asof_join_backward_inclusive(ray_session):
    from quichash_ray.stages.asofjoin import asof_join

    ts = pa.timestamp("us")
    left = pa.table(
        {
            "user": pa.array([1, 1, 1, 2, 3], pa.int64()),
            "ts": pa.array([100, 250, 400, 50, 10], pa.int64()).cast(ts),
            "lid": pa.array([10, 11, 12, 13, 14], pa.int64()),
        }
    )
    right = pa.table(
        {
            "user": pa.array([1, 1, 2, 2], pa.int64()),
            "ts": pa.array([100, 300, 40, 60], pa.int64()).cast(ts),
            "rid": pa.array([20, 21, 22, 23], pa.int64()),
        }
    )
    out = (
        asof_join(
            _ds(left),
            _ds(right),
            by="user",
            ts_col="ts",
            left_cols=["lid"],
            right_cols=["rid"],
            num_parts=3,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # lid 10: exact match at ts=100 (inclusive) -> rid 20
    # lid 11: latest <= 250 is ts=100 -> rid 20
    # lid 12: latest <= 400 is ts=300 -> rid 21
    # lid 13: user 2, latest <= 50 is ts=40 -> rid 22
    # lid 14: user 3 has no right rows -> null
    assert out["rid"].tolist()[:4] == [20, 20, 21, 22]
    assert pd.isna(out["rid"].iloc[4])
    assert str(out["rid"].dtype) in ("Int64", "float64", "object")


def test_asof_join_tie_break_max(ray_session):
    """Two right rows at the SAME (key, ts): greatest tiebreak_col wins."""
    from quichash_ray.stages.asofjoin import asof_join

    ts = pa.timestamp("us")
    left = pa.table(
        {
            "user": pa.array([7], pa.int64()),
            "ts": pa.array([500], pa.int64()).cast(ts),
            "lid": pa.array([1], pa.int64()),
        }
    )
    right = pa.table(
        {
            "user": pa.array([7, 7], pa.int64()),
            "ts": pa.array([500, 500], pa.int64()).cast(ts),
            "rid": pa.array([41, 99], pa.int64()),
        }
    )
    out = asof_join(
        _ds(left, 1),
        _ds(right, 2),
        by="user",
        ts_col="ts",
        left_cols=["lid"],
        right_cols=["rid"],
        tiebreak_col="rid",
        num_parts=2,
    ).to_pandas()
    assert out["rid"].tolist() == [99]


def test_asof_join_matches_duckdb(ray_session, sf0001_dir):
    """The events_asof_join query vs DuckDB's native ASOF JOIN."""
    import duckdb

    import __ray_entry__ as entry

    got = (
        entry.queries()["events_asof_join"](sf0001_dir)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf0001_dir}/events.parquet'"
    )
    want = (
        con.execute(entry.oracle_sql()["events_asof_join"])
        .fetchdf()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got["purchase_event_id"].astype("Int64").equals(
        want["purchase_event_id"].astype("Int64")
    )
    assert got["lag_us"].astype("Int64").equals(
        want["lag_us"].astype("Int64")
    )


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_pii_scrub_counts_and_redaction(ray_session):
    from quichash_ray.pipelines.pii import pii_scrub

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "mail a@b.com and c.d+x@e.org today",
                    "host 10.1.2.3 peer 192.168.0.1",
                    "ssn 123-45-6789 ok",
                    None,
                ],
                pa.string(),
            ),
        }
    )
    out = pii_scrub(_ds(t)).to_pandas().sort_values("doc_id")
    assert out["n_emails"].tolist() == [2, 0, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 2, 0, 0]
    assert out["n_ssn"].tolist() == [0, 0, 1, 0]
    assert out["clean_text"].tolist()[0] == "mail <EMAIL> and <EMAIL> today"
    assert out["clean_text"].tolist()[1] == "host <IP> peer <IP>"
    assert out["clean_text"].tolist()[2] == "ssn <SSN> ok"
    assert out["clean_text"].isna().tolist() == [False, False, False, True]


# ---------------------------------------------------------------------------
# line dedup
# ---------------------------------------------------------------------------


def _line_docs() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "alpha\nBOILER\nalpha",  # within-doc dup + boiler
                    "beta\nBOILER",
                    "gamma\nBOILER\nunique3",
                    "BOILER",  # all lines common -> clean_text ''
                ],
                pa.string(),
            ),
        }
    )


def test_line_stats(ray_session):
    from quichash_ray.pipelines.linededup import line_stats

    out = line_stats(_ds(_line_docs())).to_pandas().sort_values("doc_id")
    assert out["n_lines"].tolist() == [3, 2, 3, 1]
    assert out["n_distinct_lines"].tolist() == [2, 2, 3, 1]
    assert out["dup_line_bp"].tolist() == [3333, 0, 0, 0]


def test_boilerplate_removal(ray_session):
    from quichash_ray.pipelines.linededup import boilerplate_removal

    # BOILER appears in 4/4 docs (df=100%); threshold 50% drops it only
    out = (
        boilerplate_removal(_ds(_line_docs()), n_docs=4, pct=50)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_removed"].tolist() == [1, 1, 1, 1]
    assert out["clean_text"].tolist() == [
        "alpha\nalpha",
        "beta",
        "gamma\nunique3",
        "",
    ]


def test_common_lines_bound(ray_session):
    """df counts DOCS (within-doc dups counted once)."""
    from quichash_ray.pipelines.linededup import common_lines

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["x\nx\nx", "y"], pa.string()),
        }
    )
    # x appears 3 times but only in 1 of 2 docs -> df 50%, threshold 60%
    assert common_lines(_ds(t, 1), n_docs=2, pct=60) == []
    assert common_lines(_ds(t, 1), n_docs=2, pct=50) == ["x", "y"]


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


def test_semantic_dedup_matches_exact_reference(ray_session, sf0001_dir):
    """keep/rep decisions vs a brute-force exact pipeline (exact cosine
    pairs -> exact union-find -> min-id rep). At sf0.001 the IVF
    multi-probe config recovers the exact pair set, so decisions must
    agree on >= 95% of vectors (boundary pairs may differ)."""
    import ray.data

    from quichash_ray.pipelines.similarity import (
        cosine_neardup_pairs,
        semantic_dedup,
    )
    from quichash_ray.stages.unionfind import driver_union_find

    emb = ray.data.read_parquet(f"{sf0001_dir}/embeddings.parquet")
    got = (
        semantic_dedup(emb, threshold=0.4, nlist=16, nprobe=4)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    exact_pairs = cosine_neardup_pairs(emb, 0.4).to_pandas()
    edges = list(zip(exact_pairs["vec_id_a"], exact_pairs["vec_id_b"]))
    root = driver_union_find(edges)
    # min-id rep per exact component
    comp_min: dict[int, int] = {}
    for n, r in root.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    want_rep = {
        v: comp_min.get(root[v], v) if v in root else v
        for v in got.index
    }
    agree = sum(got.loc[v, "rep_id"] == want_rep[v] for v in got.index)
    assert agree / len(got) >= 0.95
    # every vector present exactly once; keep iff own representative
    assert (got["keep"] == (got.index == got["rep_id"]).astype(int)).all()
    assert len(got) == emb.count()


# ---------------------------------------------------------------------------
# vocab top-k
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------


def test_hash_sample_deterministic_and_unbiased(ray_session):
    import hashlib

    from quichash_ray.pipelines.sampling import hash_sample

    t = pa.table(
        {
            "doc_id": pa.array(list(range(1000)), pa.int64()),
            "payload": pa.array([f"p{i}" for i in range(1000)], pa.string()),
        }
    )
    a = hash_sample(_ds(t, 4), rate_bp=2000).to_pandas()
    b = hash_sample(_ds(t, 7), rate_bp=2000).to_pandas()  # other partitioning
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # partition-invariant
    # exact membership rule
    thr = format((2000 * (1 << 32)) // 10000, "08x")
    want = [
        i
        for i in range(1000)
        if hashlib.md5(str(i).encode()).hexdigest()[:8] < thr
    ]
    assert sorted(a["doc_id"]) == want
    assert 100 < len(want) < 300  # ~20%


def test_cap_per_group(ray_session):
    import hashlib

    from quichash_ray.pipelines.sampling import cap_per_group

    t = pa.table(
        {
            "doc_id": pa.array(list(range(60)), pa.int64()),
            "source": pa.array(
                [f"s{i % 3}" for i in range(60)], pa.string()
            ),
        }
    )
    out = cap_per_group(_ds(t, 3), "source", k=4).to_pandas()
    assert len(out) == 12
    assert (out.groupby("source").size() == 4).all()
    assert set(out["rnk"]) == {1, 2, 3, 4}
    # matches the reference rule: first 4 per group by (md5(id), id)
    for s in ("s0", "s1", "s2"):
        ids = [i for i in range(60) if f"s{i % 3}" == s]
        want = sorted(
            ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
        )[:4]
        assert sorted(out[out.source == s]["doc_id"]) == sorted(want)


def test_vocab_topk_order_and_ties(ray_session):
    from quichash_ray.pipelines.textstats import vocab_topk

    t = pa.table(
        {
            "text": pa.array(
                ["b a a", "c b\tc", "a \n d"], pa.string()
            )
        }
    )
    out = vocab_topk(_ds(t), k=3).to_pandas()
    # counts: a=3, b=2, c=2, d=1 -> ties broken token ASC
    assert out["token"].tolist() == ["a", "b", "c"]
    assert out["cnt"].tolist() == [3, 2, 2]
