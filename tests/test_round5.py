"""Round-5 additions: window primitives (row_number / rank / dense_rank /
lag), the Q7-style nation-pair chain, and regression guards for the
round-5 oracle-divergence fixes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _make_ds(rows: dict):
    import ray.data

    return ray.data.from_arrow(pa.table(rows))


# ---------------------------------------------------------------------------
# _ranks_sorted kernel (pure, no Ray)
# ---------------------------------------------------------------------------


def _df(key, order, extra=None):
    d = {"k": key, "o": order}
    if extra:
        d.update(extra)
    return pd.DataFrame(d)


def test_row_number_resets_per_key():
    from quichash_ray.pipelines.window import _ranks_sorted

    df = _df([1, 1, 1, 2, 2], [10, 20, 30, 5, 6])
    assert _ranks_sorted(df, "k", ["o"], "row_number").tolist() == [
        1, 2, 3, 1, 2,
    ]


def test_rank_ties_share_and_gap():
    from quichash_ray.pipelines.window import _ranks_sorted

    # ties at o=10 → both rank 1, next rank 3 (SQL RANK gap)
    df = _df([1, 1, 1, 1], [10, 10, 20, 30])
    assert _ranks_sorted(df, "k", ["o"], "rank").tolist() == [1, 1, 3, 4]


def test_rank_does_not_leak_across_key_boundary():
    """Regression: carrying rank anchors by VALUE max-accumulate would
    keep key 1's larger anchor into key 2 (rn resets to 1 < 5)."""
    from quichash_ray.pipelines.window import _ranks_sorted

    df = _df(
        [1, 1, 1, 1, 1, 2, 2, 2],
        [1, 2, 3, 4, 5, 7, 7, 9],
    )
    assert _ranks_sorted(df, "k", ["o"], "rank").tolist() == [
        1, 2, 3, 4, 5, 1, 1, 3,
    ]


def test_dense_rank_no_gaps_and_resets():
    from quichash_ray.pipelines.window import _ranks_sorted

    df = _df([1, 1, 1, 2, 2, 2], [10, 10, 20, 4, 4, 4])
    assert _ranks_sorted(df, "k", ["o"], "dense_rank").tolist() == [
        1, 1, 2, 1, 1, 1,
    ]


def test_rank_multi_order_col_tie_definition():
    from quichash_ray.pipelines.window import _ranks_sorted

    # tie only when BOTH order columns are equal
    df = pd.DataFrame(
        {"k": [1, 1, 1], "o": [10, 10, 10], "p": [5, 5, 6]}
    )
    assert _ranks_sorted(df, "k", ["o", "p"], "rank").tolist() == [1, 1, 3]


# ---------------------------------------------------------------------------
# window_rank / window_lag end-to-end (Ray, tiny data)
# ---------------------------------------------------------------------------


def test_window_rank_row_number_keep_top(ray_session):
    from quichash_ray.pipelines.window import window_rank

    ds = _make_ds(
        {
            "uid": [1, 1, 1, 1, 2, 2],
            "ts": [10, 30, 20, 40, 7, 5],
            "eid": [100, 101, 102, 103, 104, 105],
        }
    )
    out = window_rank(
        ds,
        key_col="uid",
        order_cols=["ts", "eid"],
        descending=[True, True],
        method="row_number",
        keep_top=2,
    ).to_pandas()
    got = {
        (r.uid, r.eid): r.rn for r in out.itertuples()
    }
    # uid 1: most recent ts 40 (eid 103) then 30 (eid 101)
    assert got == {(1, 103): 1, (1, 101): 2, (2, 104): 1, (2, 105): 2}


def test_window_rank_string_key(ray_session):
    from quichash_ray.pipelines.window import window_rank

    ds = _make_ds(
        {
            "lang": ["py", "py", "rs", "rs", "rs"],
            "v": [3, 9, 4, 4, 1],
            "id": [1, 2, 3, 4, 5],
        }
    )
    out = window_rank(
        ds,
        key_col="lang",
        order_cols=["v"],
        descending=[True],
        carry_cols=["id"],
        method="rank",
        out_col="rnk",
    ).to_pandas()
    got = {(r.lang, r.id): r.rnk for r in out.itertuples()}
    assert got == {
        ("py", 2): 1, ("py", 1): 2,
        ("rs", 3): 1, ("rs", 4): 1, ("rs", 5): 3,
    }


def test_window_lag_first_row_null(ray_session):
    from quichash_ray.pipelines.window import window_lag

    ds = _make_ds(
        {
            "uid": [1, 1, 1, 2],
            "ts": [1, 2, 3, 1],
            "eid": [10, 11, 12, 13],
            "cents": [100, 250, 50, 7],
        }
    )
    out = window_lag(
        ds,
        key_col="uid",
        order_cols=["ts", "eid"],
        value_col="cents",
        prev_col="prev",
        delta_col="delta",
    ).to_pandas()
    out = out.set_index("eid")
    assert pd.isna(out.loc[10, "prev"]) and pd.isna(out.loc[13, "prev"])
    assert out.loc[11, "prev"] == 100 and out.loc[11, "delta"] == 150
    assert out.loc[12, "prev"] == 250 and out.loc[12, "delta"] == -200


def test_window_matches_duckdb_on_sf0001(ray_session, sf0001_dir):
    """events_recent_topk / events_value_rank / events_lag_delta vs
    DuckDB window functions at sf0.001 — full value comparison."""
    import duckdb

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * "
        f"FROM read_parquet('{sf0001_dir}/events.parquet')"
    )
    for name in (
        "events_recent_topk", "events_value_rank", "events_lag_delta"
    ):
        got = qs[name](sf0001_dir).to_pandas()
        want = con.execute(osql[name]).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), name
        g = got[cols].sort_values(cols).reset_index(drop=True)
        w = want[cols].sort_values(cols).reset_index(drop=True)
        for c in cols:
            if g[c].dtype == object:
                g[c] = g[c].astype(str)
                w[c] = w[c].astype(str)
        pd.testing.assert_frame_equal(g, w, check_dtype=False)


# ---------------------------------------------------------------------------
# Q7-style nation-pair chain
# ---------------------------------------------------------------------------


def test_nation_pair_volume_matches_duckdb(ray_session, sf0001_dir):
    import duckdb

    import __ray_entry__ as entrymod

    got = (
        entrymod.queries()["tpch_nation_pair_volume"](sf0001_dir)
        .to_pandas()
    )
    con = duckdb.connect()
    for t in ("lineitem", "orders", "supplier", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{sf0001_dir}/{t}.parquet')"
        )
    want = con.execute(
        entrymod.oracle_sql()["tpch_nation_pair_volume"]
    ).df()
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_nation_pair_drops_unknown_dim_keys(ray_session):
    """Inner-join semantics: lineitems with a suppkey absent from the
    supplier dim (and orders with unknown custkey) contribute nothing."""
    from quichash_ray.pipelines.analytics import nation_pair_volume

    lineitem = _make_ds(
        {
            "l_orderkey": [1, 1, 2],
            "l_suppkey": [10, 99, 10],  # 99 unknown
            "l_extendedprice": [1.0, 1.0, 2.0],
            "l_discount": [0.0, 0.0, 0.0],
            "l_shipdate": pa.array(
                [np.datetime64("1996-06-01T00:00:00", "us")] * 3,
                pa.timestamp("us"),
            ),
        }
    )
    orders = _make_ds(
        {"o_orderkey": [1, 2], "o_custkey": [100, 999]}  # 999 unknown
    )
    supplier = _make_ds({"s_suppkey": [10], "s_nationkey": [0]})
    customer = _make_ds({"c_custkey": [100], "c_nationkey": [1]})
    nation = _make_ds(
        {"n_nationkey": [0, 1], "n_name": ["ALPHA", "BETA"]}
    )
    out = nation_pair_volume(
        lineitem, orders, supplier, customer, nation
    ).to_pandas()
    # order 2 drops (unknown custkey); lineitem with suppkey 99 drops
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.supp_nation, r.cust_nation) == ("ALPHA", "BETA")
    assert r.revenue == 100 * 100 and r.n_items == 1


# ---------------------------------------------------------------------------
# round-5 divergence-fix regression guards
# ---------------------------------------------------------------------------


def test_shingle_table_does_not_split_on_vertical_tab(ray_session):
    """str.split() would split on \\v / NBSP; the oracle's \\S+ must not."""
    from quichash_ray.pipelines.ngram import shingle_table

    a = "a b c d e"
    b = "a b\x0bc d e"  # \v inside a token → 4 tokens under \S+
    ds = _make_ds({"doc_id": [1, 2], "text": [a, b]})
    out = shingle_table(ds, k=5).to_pandas()
    # doc 1: exactly one 5-gram; doc 2: only 4 tokens under \S+, so NO
    # 5-gram (str.split() would have produced the SAME gram as doc 1)
    assert len(out[out.doc_id == 1]) == 1
    assert len(out[out.doc_id == 2]) == 0


def test_mad_outliers_null_group_key_skipped(ray_session):
    from quichash_ray.pipelines.outliers import mad_outliers

    ds = _make_ds(
        {
            "id": [1, 2, 3, 4, 5, 6],
            "grp": ["a", "a", "a", "a", "a", None],
            "v": [10, 10, 10, 10, 1000, 999999],
        }
    )
    out = mad_outliers(
        ds, group_col="grp", value_col="v", id_col="id", k=3
    ).to_pandas()
    # null-group row neither crashes nor appears; the a-group outlier does
    assert out["id"].tolist() == [5]


def test_rollup_null_dim_is_real_group(ray_session):
    from quichash_ray.pipelines.textstats import rollup_stats

    ds = _make_ds(
        {
            "lang": ["py", None, "py"],
            "source": ["gh", "gh", None],
            "n_chars": [10, 20, 40],
        }
    )
    t = rollup_stats(ds).to_pandas()
    fine = t[t.n_docs.notna()]
    # fine level must contain the (None, 'gh') data group with sum 20
    m = fine[
        fine["lang"].isna() & (fine["source"] == "gh")
        & (fine["n_docs"] == 1)
    ]
    assert (m["sum_n_chars"] == 20).any()
    # grand total row (both dims aggregated out) still sums everything
    g = fine[fine["lang"].isna() & fine["source"].isna()]
    assert 70 in g["sum_n_chars"].tolist()


def test_sampled_recall_report_bounded_and_consistent(ray_session):
    """sample_queries bounds the exact truth to a deterministic md5-order
    query budget: n_query_sample is recorded in-row, the exact pair set
    only touches sampled ids, and on a sample covering every id the
    report equals the full-truth report."""
    import ray.data

    from quichash_ray.pipelines.similarity import embedding_recall_report

    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = ds.count()

    full = embedding_recall_report(
        ds, threshold=0.4, num_planes=4, num_bands=16
    ).to_pylist()[0]
    assert full["n_query_sample"] == 0  # full truth marker

    # sample ≥ n ⇒ identical to full truth
    allq = embedding_recall_report(
        ds, threshold=0.4, num_planes=4, num_bands=16, sample_queries=n
    ).to_pylist()[0]
    assert allq["n_query_sample"] == n
    assert allq["n_exact"] == full["n_exact"]
    assert allq["recall_bp"] == full["recall_bp"]

    # a strict subsample: bounded truth, recall still gated, deterministic
    a = embedding_recall_report(
        ds, threshold=0.4, num_planes=4, num_bands=16, sample_queries=64
    ).to_pylist()[0]
    b = embedding_recall_report(
        ds, threshold=0.4, num_planes=4, num_bands=16, sample_queries=64
    ).to_pylist()[0]
    assert a == b  # md5-order sampling has no RNG
    assert a["n_query_sample"] == 64
    assert a["n_exact"] <= full["n_exact"]
    assert a["recall_bp"] >= 9000


def test_ivf_knn_topk_exact_hit_gate(ray_session):
    """The driver query's in-row exact_hit column: every row marked, and
    IVF/exact top-k overlap ≥ 0.9 at the registered config."""
    import __ray_entry__ as e

    t = e.queries()["ivf_knn_topk"]("/root/testdata/sf0.001").to_pandas()
    assert len(t) == 50
    assert set(t["exact_hit"]) <= {0, 1}
    assert t["exact_hit"].mean() >= 0.9


def test_substring_spans_dp_verified_no_mismatch(ray_session):
    """verify_gate spans: the sampled DP recomputation must agree with the
    rolling-hash search on every sampled pair (dp_verified has no zeros),
    and the un-gated call keeps the original 4-column schema."""
    import ray.data

    from quichash_ray.stages.suffix import _lcs_dp, substring_spans
    import numpy as np
    import pyarrow as pa

    # kernel sanity on a known case
    a = np.array([1, 2, 3, 4, 5, 9], np.uint64)
    b = np.array([7, 2, 3, 4, 8], np.uint64)
    assert _lcs_dp(a, b) == 3

    rows = pa.table(
        {
            "row_id": pa.array([1, 2, 3, 4], pa.int64()),
            "cluster_id": pa.array([1, 1, 2, 2], pa.int64()),
            "content": pa.array(
                [
                    "a b c d e f g h",
                    "z a b c d e f q",
                    "one two three four five",
                    "six one two three four",
                ]
            ),
        }
    )
    ds = ray.data.from_arrow(rows)
    from quichash_ray.config import FuzzyConfig

    cfg = FuzzyConfig(suffix_min_span_tokens=3)
    gated = substring_spans(ds, cfg, verify_gate="0123456789abcdef")
    out = gated.to_pandas()
    assert len(out) == 2
    assert (out["dp_verified"] == 1).all()  # full gate ⇒ all sampled, all agree
    plain = substring_spans(ds, cfg).to_pandas()
    assert list(plain.columns) == ["cluster_id", "id_a", "id_b", "span_tokens"]


def test_hash_exchange_streaming_split_lazy_input(ray_session):
    """Lazy (un-materialized) inputs take the round-5 streaming split —
    one split task per block as it lands, no whole-input materialize —
    and produce results identical to the materialized flat path and to
    sort-groupby. Empty-block and list-input shapes included."""
    import ray.data

    from quichash_ray.stages import exchange
    from quichash_ray.stages.exchange import hash_exchange

    rng = np.random.default_rng(55)
    n, P = 20_000, 13
    t = pa.table(
        {
            "part": pa.array(rng.integers(0, P, n), pa.int64()),
            "v": pa.array(rng.integers(0, 1000, n), pa.int64()),
        }
    )

    def agg(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"s": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        v = np.asarray(g["v"], np.int64)
        return pa.table(
            {
                "s": pa.array([int(v.sum())], pa.int64()),
                "c": pa.array([len(v)], pa.int64()),
            }
        )

    blocks = [t.slice(i * 1000, 1000) for i in range(20)]

    def lazy():
        # a map_batches stage keeps the dataset un-materialized
        return ray.data.from_arrow(blocks).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=None
        )

    out_stream = hash_exchange(lazy(), "part", agg, P).to_pandas()
    assert exchange._LAST_REGIME == "stream"
    out_flat = hash_exchange(
        ray.data.from_arrow(blocks).materialize(), "part", agg, P
    ).to_pandas()
    assert exchange._LAST_REGIME == "split"
    out_sort = hash_exchange(
        lazy(), "part", agg, P, use_sort_groupby=True
    ).to_pandas()
    key = lambda df: sorted(map(tuple, df[["s", "c"]].to_numpy().tolist()))
    assert key(out_stream) == key(out_flat) == key(out_sort)
    assert sum(c for _, c in key(out_stream)) == n

    # list input, one leg lazy -> still streaming, still exact
    half = ray.data.from_arrow(blocks[:10]).materialize()
    rest = lazy_rest = ray.data.from_arrow(blocks[10:]).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=None
    )
    out_list = hash_exchange([half, rest], "part", agg, P).to_pandas()
    assert exchange._LAST_REGIME == "stream"
    assert key(out_list) == key(out_flat)

    # drop_part=False keeps the partition column visible to fn
    def check_part(g: pa.Table) -> pa.Table:
        return pa.table(
            {"has": pa.array([int("part" in g.column_names)], pa.int64())}
        )

    out_keep = hash_exchange(
        lazy(), "part", check_part, P, drop_part=False
    ).to_pandas()
    assert (out_keep["has"] == 1).all()
