"""Driver contract for the quichash_ray engine.

``entry()`` runs the flagship exact-dedup pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL for every SQL-expressible
query (same column names — the driver hashes values after sorting columns by
name). Non-SQL-expressible ops (MinHash/LSH, SimHash, clustering) have no
oracle entry → driver records rows-only checks; their correctness gates live
in tests/ against brute-force oracles.

Ray is initialised by the driver BEFORE import: nothing here calls
``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_SF0001 = "/root/testdata/sf0.001"


def _docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def _emb(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def entry() -> Any:
    """Flagship: dup-planted documents → sha256 digest → duplicate groups."""
    from quichash_ray.pipelines.dedup import digest_table, duplicate_groups
    from quichash_ray.pipelines.derived import dup_planted

    planted = dup_planted(_docs(_SF0001))
    digests = digest_table(
        planted, content_col="text", key_cols=("path",), algorithm="sha256"
    )
    return duplicate_groups(digests, id_col="path")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_exact_dup_groups(sf_dir: str):
    from quichash_ray.pipelines.dedup import digest_table, duplicate_groups
    from quichash_ray.pipelines.derived import dup_planted

    digests = digest_table(
        dup_planted(_docs(sf_dir)), content_col="text", key_cols=("path",)
    )
    return duplicate_groups(digests, id_col="path")


def _q_dedup_keep_first(sf_dir: str):
    from quichash_ray.pipelines.dedup import dedup_keep_first, digest_table
    from quichash_ray.pipelines.derived import dup_planted

    digests = digest_table(
        dup_planted(_docs(sf_dir)), content_col="text", key_cols=("path",)
    )
    return dedup_keep_first(digests, id_col="path")


def _q_analyze_stats(sf_dir: str):
    from quichash_ray.pipelines.dedup import analyze_stats, digest_table
    from quichash_ray.pipelines.derived import dup_planted

    digests = digest_table(
        dup_planted(_docs(sf_dir)), content_col="text", key_cols=("path",)
    )
    return analyze_stats(digests)


def _q_verify_mixed(sf_dir: str):
    """Per-entry mixed algorithm/mode verify (verify.rs:302-307): each
    stored row re-hashed with its own algorithm (md5/sha256 mix) and
    fast/normal mode (S=64 sampled)."""
    from quichash_ray.pipelines.dbops import verify_mixed
    from quichash_ray.pipelines.derived import (
        dup_planted,
        mixed_verify_scenario,
    )

    stored, current = mixed_verify_scenario(dup_planted(_docs(sf_dir)))
    return verify_mixed(stored, current, fast_sample_size=64)


def _q_verify(sf_dir: str):
    from quichash_ray.pipelines.dbops import verify_classify
    from quichash_ray.pipelines.dedup import digest_table
    from quichash_ray.pipelines.derived import dup_planted, verify_scenario

    stored, current = verify_scenario(dup_planted(_docs(sf_dir)))
    sd = digest_table(stored, content_col="text", key_cols=("path",))
    cd = digest_table(current, content_col="text", key_cols=("path",))
    return verify_classify(sd, cd)


def _q_compare(sf_dir: str):
    from quichash_ray.pipelines.dbops import compare_classify
    from quichash_ray.pipelines.dedup import digest_table
    from quichash_ray.pipelines.derived import compare_scenario

    db1, db2 = compare_scenario(_docs(sf_dir))
    d1 = digest_table(db1, content_col="text", key_cols=("path",))
    d2 = digest_table(db2, content_col="text", key_cols=("path",))
    return compare_classify(d1, d2)


def _q_moved(sf_dir: str):
    from quichash_ray.pipelines.dbops import compare_classify, moved_pairs
    from quichash_ray.pipelines.dedup import digest_table
    from quichash_ray.pipelines.derived import compare_scenario

    db1, db2 = compare_scenario(_docs(sf_dir))
    d1 = digest_table(db1, content_col="text", key_cols=("path",))
    d2 = digest_table(db2, content_col="text", key_cols=("path",))
    return moved_pairs(compare_classify(d1, d2))


def _q_multi_digest(sf_dir: str):
    """Multi-algorithm single-pass digest (hash.rs:802-911 analog)."""
    import pyarrow as pa

    from quichash_ray.stages.digest import add_digests

    ds = add_digests(_docs(sf_dir), ["md5", "sha256"], content_col="text")
    return ds.map_batches(
        lambda b: b.select(["doc_id", "md5", "sha256"]),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    )


def _q_text_quality(sf_dir: str):
    from quichash_ray.pipelines.textstats import text_quality

    return text_quality(_docs(sf_dir))


def _q_language_id(sf_dir: str):
    from quichash_ray.pipelines.textstats import language_id

    return language_id(_docs(sf_dir))


def _q_fingerprints(sf_dir: str):
    from quichash_ray.pipelines.textstats import fingerprints

    return fingerprints(_docs(sf_dir))


def _q_token_counts(sf_dir: str):
    """Whitespace + BPE-ish pre-token counts (the two token budgets a
    training pipeline tracks), vectorized RE2 both sides."""
    from quichash_ray.pipelines.textstats import token_counts

    return token_counts(_docs(sf_dir))


def _q_decontaminate(sf_dir: str):
    """Cross-corpus decontamination: training docs matching the (derived)
    eval corpus at exact-sha or normalized-fingerprint tier."""
    from quichash_ray.pipelines.decontam import decontaminate
    from quichash_ray.pipelines.derived import decontam_test_corpus

    docs = _docs(sf_dir)
    return decontaminate(docs, decontam_test_corpus(docs))


def _q_gopher_quality(sf_dir: str):
    """Gopher-rule-style quality signals (token bounds, stopword ratio,
    duplicate-3-gram share) with integer-exact thresholds."""
    from quichash_ray.pipelines.textstats import gopher_quality

    return gopher_quality(
        _docs(sf_dir),
        min_tokens=5,
        min_stopword_ratio_bp=100,
        max_dup_3gram_bp=2000,
    )


def _q_clean_corpus(sf_dir: str):
    """The composed training-data hygiene pipeline, end to end: Gopher
    quality gate → language gate (en) → cross-corpus decontamination →
    exact dedup keep-first — each stage an existing oracle-checked
    operator, here chained as one streaming Dataset flow over the
    planted-duplicate corpus. → (digest, path) of surviving documents."""
    from quichash_ray.pipelines.decontam import decontaminate
    from quichash_ray.pipelines.dedup import dedup_keep_first, digest_table
    from quichash_ray.pipelines.derived import (
        decontam_test_corpus,
        dup_planted,
    )
    from quichash_ray.pipelines.textstats import gopher_quality, language_id
    from quichash_ray.stages.lookup import semi_join_broadcast

    docs = _docs(sf_dir)
    passing = gopher_quality(
        docs, min_tokens=5, min_stopword_ratio_bp=100, max_dup_3gram_bp=2000
    ).filter(expr="passes == 1").select_columns(["doc_id"])
    english = language_id(docs).filter(
        expr="pred_lang == 'en'"
    ).select_columns(["doc_id"])
    planted = dup_planted(docs)
    gated = semi_join_broadcast(
        semi_join_broadcast(planted, passing, "doc_id"), english, "doc_id"
    )
    clean = decontaminate(
        gated, decontam_test_corpus(docs), id_col="path", emit="clean"
    )
    digests = digest_table(clean, content_col="text", key_cols=("path",))
    return dedup_keep_first(digests, id_col="path")


def _q_ngram_jaccard(sf_dir: str):
    from quichash_ray.pipelines.ngram import jaccard_pairs

    # gram_cap=None: the DuckDB oracle computes UNCAPPED pair counts, so the
    # oracle-checked configuration disables the skew cap (production default
    # keeps it, with dropped-gram counts on the metrics actor)
    return jaccard_pairs(
        _docs(sf_dir), k=5, threshold_num=1, threshold_den=2, gram_cap=None
    )


def _q_containment_pairs(sf_dir: str):
    """Asymmetric near-dup: pairs where the smaller doc's 5-gram set is
    ≥4/5 contained in the other — run over the clone-planted corpus so
    the planted preamble-clones (full containment, diluted Jaccard) are
    the designed hits. gram_cap=None for the uncapped oracle config."""
    from quichash_ray.pipelines.derived import clone_planted
    from quichash_ray.pipelines.ngram import containment_pairs

    return containment_pairs(
        clone_planted(_docs(sf_dir)), k=5, threshold_num=4,
        threshold_den=5, gram_cap=None,
    )


def _q_knn_topk(sf_dir: str):
    from quichash_ray.pipelines.similarity import knn_topk

    out = knn_topk(_emb(sf_dir), query_ids=list(range(10)), k=5)
    return out.map_batches(
        lambda b: b.rename_columns(["query_id", "vec_id", "rnk"]),
        batch_format="pyarrow", batch_size=None,
    )


def _q_embedding_neardup(sf_dir: str):
    from quichash_ray.pipelines.similarity import cosine_neardup_pairs

    return cosine_neardup_pairs(_emb(sf_dir), threshold=0.4, a_limit=10**9)


def _q_fast_mode_digest(sf_dir: str):
    """Fast-mode sampled digests (hash.rs:977-1066) with a scaled-down
    sample window S=64 chars so the documents table exercises the sampled
    path; text is ASCII so byte and char offsets coincide (oracle uses
    substr arithmetic)."""
    import pyarrow as pa

    from quichash_ray.stages.digest import add_digests

    ds = add_digests(
        _docs(sf_dir),
        ["sha256"],
        content_col="text",
        fast_mode=True,
        fast_sample_size=64,
    )
    return ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "fast_digest": b["sha256"],
                "fast_mode": b["fast_mode"],
            }
        ),
        batch_format="pyarrow", batch_size=None,
    )


def _q_top_wasted_groups(sf_dir: str):
    """Top-10 duplicate groups by wasted space (dedup.rs:626 sort) with a
    deterministic (wasted desc, digest asc) tie-break so LIMIT is stable."""
    from quichash_ray.pipelines.dedup import digest_table, duplicate_groups
    from quichash_ray.pipelines.derived import dup_planted

    groups = duplicate_groups(
        digest_table(
            dup_planted(_docs(sf_dir)), content_col="text", key_cols=("path",)
        ),
        id_col="path",
    )
    return groups.sort(["wasted", "digest"], descending=[True, False]).limit(10)


def _q_events_window_agg(sf_dir: str):
    """Tumbling-window aggregate over the events table (hourly windows):
    the batch-mode windowed aggregation a training-data pipeline needs —
    banded shuffle keyed on (window, event_type)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.partitioning import dataset_num_parts

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    num_parts = dataset_num_parts(ds, bytes_per_row=32, target_bytes=32 << 20)

    def add_window(b: pa.Table) -> pa.Table:
        ts = b["ts"].combine_chunks() if isinstance(
            b["ts"], pa.ChunkedArray
        ) else b["ts"]
        us = np.asarray(ts.cast(pa.int64()))
        hour = (us // 3_600_000_000) * 3_600_000_000
        part = (hour // 3_600_000_000) % num_parts
        return pa.table(
            {
                "window_start": pa.array(hour, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "event_type": b["event_type"],
                "value": b["value"],
                "part": pa.array(part, pa.int64()),
            }
        )

    def agg(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "window_start": pa.array([], pa.timestamp("us")),
                    "event_type": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        df = g.to_pandas()
        out = (
            df.groupby(["window_start", "event_type"], sort=False)
            .agg(cnt=("value", "size"), sum_value=("value", "sum"))
            .reset_index()
        )
        out["cnt"] = out["cnt"].astype("int64")
        # integer cents: float sums are order-dependent in a distributed
        # engine (1e-13 drift vs the oracle); cents are exact
        out["sum_cents"] = (out["sum_value"] * 100).round().astype("int64")
        return pa.Table.from_pandas(
            out[["window_start", "event_type", "cnt", "sum_cents"]],
            preserve_index=False,
        )

    return hash_exchange(
        ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "part",
        agg,
        num_parts,
    )


def _q_events_hopping_agg(sf_dir: str):
    """Hopping-window aggregate (size 1h, hop 30min): each event lands in
    two overlapping windows — the sliding-window analog of the tumbling
    aggregate, expressed as a 2x row expansion + the same banded exchange."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.partitioning import dataset_num_parts

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    num_parts = dataset_num_parts(ds, bytes_per_row=64, target_bytes=32 << 20)
    H = 3_600_000_000
    HALF = H // 2

    def expand(b: pa.Table) -> pa.Table:
        ts = b["ts"].combine_chunks() if isinstance(
            b["ts"], pa.ChunkedArray
        ) else b["ts"]
        us = np.asarray(ts.cast(pa.int64()))
        ws1 = (us // H) * H
        ws2 = ((us - HALF) // H) * H + HALF
        ws = np.concatenate([ws1, ws2])
        et = pa.concat_arrays(
            [b["event_type"].combine_chunks()] * 2
            if isinstance(b["event_type"], pa.ChunkedArray)
            else [b["event_type"], b["event_type"]]
        )
        val = np.tile(np.asarray(b["value"], np.float64), 2)
        part = (ws // HALF) % num_parts
        return pa.table(
            {
                "window_start": pa.array(ws, pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "event_type": et,
                "value": pa.array(val, pa.float64()),
                "part": pa.array(part.astype(np.int64)),
            }
        )

    def agg(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "window_start": pa.array([], pa.timestamp("us")),
                    "event_type": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                }
            )
        df = g.to_pandas()
        out = (
            df.groupby(["window_start", "event_type"], sort=False)
            .agg(cnt=("value", "size"), sum_value=("value", "sum"))
            .reset_index()
        )
        out["cnt"] = out["cnt"].astype("int64")
        out["sum_cents"] = (out["sum_value"] * 100).round().astype("int64")
        return pa.Table.from_pandas(
            out[["window_start", "event_type", "cnt", "sum_cents"]],
            preserve_index=False,
        )

    return hash_exchange(
        ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "part",
        agg,
        num_parts,
    )


def _q_events_sessionize(sf_dir: str):
    """Session windows over the events log (30-min inactivity gap): the
    stream-shaped workload expressed batch-mode — events partition by
    user-hash, sort by ts within the partition, gap-split with pandas
    (ordering assumption: per-user ordering restored inside each group)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.partitioning import dataset_num_parts

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    gap_us = 30 * 60 * 1_000_000
    num_parts = dataset_num_parts(ds, bytes_per_row=16, target_bytes=32 << 20)

    def add_part(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"], np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "part": pa.array(uid % num_parts, pa.int64()),
            }
        )

    def sessionize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_sessions": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        g = t.to_pandas()
        g = g.sort_values(["user_id", "ts"])
        ts_us = g["ts"].astype("int64")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = ts_us.diff().gt(gap_us)
        new_session = (new_user | gap).astype("int64")
        out = (
            pd.DataFrame(
                {"user_id": g["user_id"], "ns": new_session}
            )
            .groupby("user_id", sort=False)
            .agg(n_sessions=("ns", "sum"), n_events=("ns", "size"))
            .reset_index()
        )
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return hash_exchange(
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "part",
        sessionize,
        num_parts,
    )


def _q_events_debounce(sf_dir: str):
    """Telemetry debounce dedup: drop an event when the SAME
    (user_id, event_type) fired within the last 2 h (vs the previous
    instance, kept or not — the lag() rule, exactly SQL-expressible).
    One user-hash exchange, per-partition sort + vectorized shift
    compare — the streaming-dedup workload batch-mode."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.partitioning import dataset_num_parts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    w_us = 2 * 3600 * 1_000_000
    num_parts = dataset_num_parts(ds, bytes_per_row=32, target_bytes=32 << 20)

    def add_part(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"], np.int64)
        return b.append_column(
            "part", pa.array(uid % num_parts, pa.int64())
        )

    def debounce(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
            }
        )
        if t.num_rows == 0 or "event_id" not in t.column_names:
            return empty
        g = t.to_pandas().sort_values(
            ["user_id", "event_type", "ts", "event_id"]
        )
        ts_us = g["ts"].astype("int64")
        same_key = g["user_id"].eq(g["user_id"].shift()) & g[
            "event_type"
        ].eq(g["event_type"].shift())
        keep = ~same_key | ts_us.diff().ge(w_us)
        kept = g[keep.to_numpy()]
        return pa.Table.from_pandas(
            kept[["event_id", "ts", "user_id", "event_type"]],
            preserve_index=False,
        )

    return hash_exchange(
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "part",
        debounce,
        num_parts,
    )


def _q_suppliers_per_region(sf_dir: str):
    """Dimension-chain aggregate: suppliers per region through the
    nation → region dims (both tiny → driver dicts in the closure),
    one combiner pass over supplier."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    nat = {
        int(r["n_nationkey"]): int(r["n_regionkey"])
        for r in ray.data.read_parquet(
            f"{sf_dir}/nation.parquet"
        ).take_all()
    }
    reg = {
        int(r["r_regionkey"]): r["r_name"]
        for r in ray.data.read_parquet(
            f"{sf_dir}/region.parquet"
        ).take_all()
    }

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"r_name": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        names = (
            pd.Series(pc.cast(b["s_nationkey"], pa.int64()).to_pandas())
            .map(nat)
            .map(reg)
        )
        vc = names.value_counts()
        return pa.table(
            {
                "r_name": pa.array(vc.index.to_numpy(), pa.string()),
                "n": pa.array(vc.to_numpy().astype("int64")),
            }
        )

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_nationkey"]
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby("r_name")
        .aggregate(Sum("n", alias_name="n_suppliers"))
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_suppliers" not in b.column_names:
            return pa.table(
                {"r_name": pa.array([], pa.string()),
                 "n_suppliers": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "r_name": b["r_name"],
                "n_suppliers": pc.cast(b["n_suppliers"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def _q_tpch_promo_share(sf_dir: str):
    """Q14-style promo revenue share for 1997 shipments: the part dim
    collapses to a (partkey → is_promo) int mapping through the lookup
    tiers; share = one double division of two int64 revenue sums."""
    import ray.data

    from quichash_ray.pipelines.analytics import promo_revenue_share

    return promo_revenue_share(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_partkey", "l_extendedprice", "l_discount", "l_shipdate"
            ],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
        ),
        year=1997,
    )


def _q_users_per_event_type(sf_dir: str):
    """Exact COUNT(DISTINCT) per group: distinct users per event type —
    per-batch distinct (type, user) pairs ride the combiner shuffle
    (bounded by types × users, never events), then a count per type."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def distinct_pairs(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pandas(),
                "user_id": b["user_id"].to_pandas(),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ds.map_batches(
        distinct_pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).groupby(["event_type", "user_id"]).count()
    agg = pairs.groupby("event_type").aggregate(
        Count(alias_name="n_users")
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_users" not in b.column_names:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "event_type": b["event_type"],
                "n_users": pc.cast(b["n_users"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def _q_events_running_total(sf_dir: str):
    """Cumulative window aggregate: per-user running sum of event value
    (int cents) in (ts, event_id) order — one user-hash exchange,
    per-partition sort + vectorized cumsum."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.partitioning import dataset_num_parts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    num_parts = dataset_num_parts(ds, bytes_per_row=32, target_bytes=32 << 20)

    def add_part(b: pa.Table) -> pa.Table:
        uid = np.asarray(b["user_id"], np.int64)
        cents = pc.cast(
            pc.round(
                pc.multiply(b["value"], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": b["event_id"],
                "ts": b["ts"],
                "user_id": b["user_id"],
                "cents": cents,
                "part": pa.array(uid % num_parts, pa.int64()),
            }
        )

    def running(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "cents": pa.array([], pa.int64()),
                "running_cents": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or "event_id" not in t.column_names:
            return empty
        g = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        g["running_cents"] = g.groupby("user_id", sort=False)[
            "cents"
        ].cumsum()
        return pa.Table.from_pandas(
            g[["event_id", "user_id", "cents", "running_cents"]].astype(
                "int64"
            ),
            preserve_index=False,
        )

    return hash_exchange(
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "part",
        running,
        num_parts,
    )


def _q_events_recent_topk(sf_dir: str):
    """Dedup-by-recency window primitive: ROW_NUMBER() per user over
    (ts DESC, event_id DESC), keep the 3 most recent events — one
    user-hash exchange, vectorized per-partition sort + cumcount
    (generalizes latest_snapshot to ranked retention)."""
    import ray.data

    from quichash_ray.pipelines.window import window_rank

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"],
    )
    return window_rank(
        ds,
        key_col="user_id",
        order_cols=["ts", "event_id"],
        descending=[True, True],
        method="row_number",
        out_col="rn",
        keep_top=3,
    ).select_columns(["user_id", "event_id", "rn"])


def _q_events_value_rank(sf_dir: str):
    """RANK() (ties share, gaps follow) per event type by value cents
    DESC; keep rank ≤ 5 — tie definition is the int64 cents value on
    both sides, so rank assignment is exact."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from quichash_ray.pipelines.window import window_rank

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "event_type": b["event_type"],
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(b["value"], pa.scalar(100.0)),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    return window_rank(
        ds.map_batches(
            to_cents, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        key_col="event_type",
        order_cols=["cents"],
        descending=[True],
        carry_cols=["event_id"],
        method="rank",
        out_col="rnk",
        keep_top=5,
    ).select_columns(["event_type", "event_id", "cents", "rnk"])


def _q_events_lag_delta(sf_dir: str):
    """LAG window primitive: per-user previous event value (int cents)
    in (ts, event_id) order plus the delta; each user's first event has
    null prev/delta (genuine SQL LAG semantics)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from quichash_ray.pipelines.window import window_lag

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )

    def to_cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": pc.cast(b["event_id"], pa.int64()),
                "ts": b["ts"],
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(b["value"], pa.scalar(100.0)),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    return window_lag(
        ds.map_batches(
            to_cents, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        key_col="user_id",
        order_cols=["ts", "event_id"],
        value_col="cents",
        prev_col="prev_cents",
        delta_col="delta_cents",
    ).select_columns(
        ["event_id", "user_id", "cents", "prev_cents", "delta_cents"]
    )


def _q_tpch_nation_pair_volume(sf_dir: str):
    """Q7-style two-fact-chain query: revenue shipped between every
    distinct (supplier nation, customer nation) pair in 1996–1997 —
    chained multi-shuffle plan (two dim lookups + one orderkey
    exchange), pruned reads, integer cents."""
    import ray.data

    from quichash_ray.pipelines.analytics import nation_pair_volume

    return nation_pair_volume(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount", "l_shipdate",
            ],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_nationkey"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"],
        ),
        ray.data.read_parquet(f"{sf_dir}/nation.parquet"),
    )


def _q_tpch_late_orders(sf_dir: str):
    """Q4-style EXISTS semi-join aggregate: orders per priority with ≥1
    item shipped >90 days after the order date — existence resolved
    locally inside one orderkey-hash exchange."""
    import ray.data

    from quichash_ray.pipelines.analytics import late_orders_by_priority

    return late_orders_by_priority(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_shipdate"],
        ),
        late_days=90,
    )


def _q_top_quality_per_source(sf_dir: str):
    """Quality-stratified curation: keep the 10 LONGEST docs per source
    (n_chars DESC, doc_id ASC) — ranked selection by a data column, vs
    cap_per_source's uniform hash subsample."""
    from quichash_ray.pipelines.sampling import top_per_group

    return top_per_group(_docs(sf_dir), k=10, score_col="n_chars")


def _q_dup_size_histogram(sf_dir: str):
    """Duplicate-cluster size distribution over the planted-dup corpus:
    one banded digest exchange, then a combiner over the bounded
    (cnt, n_groups) histogram."""
    from quichash_ray.pipelines.dedup import digest_table, dup_size_histogram
    from quichash_ray.pipelines.derived import dup_planted

    digests = digest_table(
        dup_planted(_docs(sf_dir)), content_col="text", key_cols=("path",)
    )
    return dup_size_histogram(digests, id_col="path")


def _q_chunk_documents(sf_dir: str):
    """Context-window preparation: split every doc into consecutive
    64-token chunks — vectorized list_slice/binary_join per chunk
    position, zero shuffles."""
    from quichash_ray.pipelines.packing import chunk_documents

    return chunk_documents(_docs(sf_dir), max_tok=64)


def _q_tpch_pricing_summary(sf_dir: str):
    """Q1-style pricing summary over lineitem — integer cents/percent
    products and sums (no float accumulation), combiner pattern over
    the tiny (returnflag, linestatus) key space. Read pruned to the 7
    touched columns of the 16-column fact table (at scale the unpruned
    scan IS the query cost)."""
    import ray.data

    from quichash_ray.pipelines.analytics import pricing_summary

    return pricing_summary(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
            ],
        )
    )


def _q_tpch_top_orders(sf_dir: str):
    """Q3-style top-10 orders by revenue: big×big equi-join as ONE
    orderkey-hash exchange over both filtered projections; per-order
    revenue completes locally; only the order-level aggregate sorts."""
    import ray.data

    from quichash_ray.pipelines.analytics import top_orders_by_revenue

    return top_orders_by_revenue(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"
            ],
        ),
    )


def _q_tpch_revenue_by_nation(sf_dir: str):
    """Q5-style four-table join with size-tiered join strategies:
    orderkey exchange for lineitem⨝orders, broadcast↔join lookup for
    customer, driver dict for the 25-row nation dim."""
    import ray.data

    from quichash_ray.pipelines.analytics import revenue_by_nation

    return revenue_by_nation(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        ),
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey"],
        ),
        ray.data.read_parquet(f"{sf_dir}/nation.parquet"),
        year=1997,
    )


def _q_ngram_novelty(sf_dir: str):
    """Per-doc 5-gram novelty vs all lower-id docs (arrival-order
    marginal-information score); gram owner = min doc id, one double
    division for the ratio."""
    from quichash_ray.pipelines.ngram import ngram_novelty

    return ngram_novelty(_docs(sf_dir), k=5)


def _q_lang_length_quantiles(sf_dir: str):
    """Exact per-language token-length quantiles — per-domain length
    calibration; combiner histogram bounded by langs × distinct
    lengths, ceil-rank rule per group."""
    from quichash_ray.pipelines.textstats import group_length_quantiles

    return group_length_quantiles(_docs(sf_dir))


def _q_rollup_stats(sf_dir: str):
    """GROUPING-SETS rollup of doc counts + char sums over
    (lang, source): all four aggregation levels from one combiner pass,
    coarser levels folded exactly from the bounded finest level."""
    from quichash_ray.pipelines.textstats import rollup_stats

    return rollup_stats(_docs(sf_dir))


def _q_profile_documents(sf_dir: str):
    """Single-pass table profile of documents (nulls + typed min/max per
    column, no shuffle — partials are columns×4 values per block)."""
    from quichash_ray.pipelines.profile import profile_table

    return profile_table(_docs(sf_dir))


def _q_events_outliers(sf_dir: str):
    """Per-event-type robust outlier detection: |cents − median| > 3·MAD
    with exact discrete medians from the combiner histogram (shuffle
    carries (type, cents, count) rows, never events); dollars→cents via
    half-away-from-zero to match DuckDB round()."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from quichash_ray.pipelines.outliers import mad_outliers

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"],
    )

    def cents(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(b["value"], pa.scalar(100.0)),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    return mad_outliers(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        k=3,
    )


_CORPUS_ROWS = {"sf0.001": 2000, "sf0.01": 5000, "sf0.1": 50000}


def _corpus_ds(sf_dir: str):
    """Deterministic synthetic source-code corpus sized by sf tier (the
    BASELINE.json input_hint table; cached under /tmp per size)."""
    import os

    import ray.data

    from quichash_ray.sources.corpus import write_corpus

    tier = os.path.basename(sf_dir.rstrip("/"))
    n = _CORPUS_ROWS.get(tier, 2000)
    out = write_corpus(f"/tmp/quichash_ray_corpus/n{n}", n_rows=n, seed=42)
    return ray.data.read_parquet(f"{out}/corpus"), f"{out}/truth"


def _q_corpus_fuzzy_clusters(sf_dir: str):
    """Full MinHash/LSH + SimHash + union-find clustering (north_star core).
    Non-SQL-expressible → rows-only driver check, but every row carries the
    constant truth_recall_bp column (dup-pair recall vs the planted-truth
    sidecar) so the record is correctness-bearing, not bare membership;
    the ≥0.99 recall gate also lives in tests/test_fuzzy.py."""
    from quichash_ray.pipelines.fuzzy import attach_truth_recall, fuzzy_dedup

    corpus, truth_dir = _corpus_ds(sf_dir)
    return attach_truth_recall(fuzzy_dedup(corpus), truth_dir)


def _q_corpus_recall_report(sf_dir: str):
    """One-row recall metrics vs the planted truth — the dup-pair recall
    ≥ 0.99 evidence (BASELINE.json)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from quichash_ray.pipelines.fuzzy import fuzzy_dedup

    from quichash_ray.config import FuzzyConfig
    from quichash_ray.pipelines.ngram import gram_hashes

    corpus, truth_dir = _corpus_ds(sf_dir)
    pred = fuzzy_dedup(corpus).to_pandas()
    clusters = dict(zip(pred["row_id"], pred["cluster_id"]))
    truth = pq.read_table(truth_dir).to_pandas()
    corpus_pd = corpus.select_columns(["row_id", "content"]).to_pandas()
    cfg = FuzzyConfig()
    shingles = {
        rid: gram_hashes(text.split(), cfg.shingle_k)
        for rid, text in zip(corpus_pd["row_id"], corpus_pd["content"])
    }
    from collections import defaultdict
    from itertools import combinations

    import numpy as np

    by_cluster = defaultdict(list)
    for rid, cid in zip(truth["row_id"], truth["cluster_id"]):
        by_cluster[cid].append(rid)
    req_all = found_all = req_elig = found_elig = 0
    for members in by_cluster.values():
        if len(members) < 2:
            continue
        for a, b in combinations(members, 2):
            same = clusters.get(a) == clusters.get(b)
            req_all += 1
            found_all += same
            sa, sb = shingles[a], shingles[b]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            if union and inter / union >= cfg.jaccard_threshold:
                req_elig += 1
                found_elig += same
    return pd.DataFrame(
        {
            "required_pairs": [req_elig],
            "found_pairs": [found_elig],
            # recall on pairs at/above the verify threshold — the ≥0.99 gate
            "recall_bp": [int(round(10000 * found_elig / max(req_elig, 1)))],
            "all_truth_pairs": [req_all],
            "all_truth_found": [found_all],
            "recall_all_bp": [int(round(10000 * found_all / max(req_all, 1)))],
        }
    )


def _q_corpus_substring_spans(sf_dir: str):
    """Suffix substring-dedup stage over fuzzy clusters (FIXTURES.md §7):
    longest common token spans ≥ 50 tokens within candidate clusters.
    Rows-only BUT metric-bearing: verify_gate="0123" recomputes ~25% of
    emitted spans (deterministic md5 sample) with the independent O(n·m)
    DP kernel and records per-row dp_verified ∈ {1 agree, 0 MISMATCH,
    -1 unsampled} — any 0 in the recorded value hash means the
    rolling-hash span search diverged from ground truth."""
    from quichash_ray.pipelines.fuzzy import fuzzy_dedup
    from quichash_ray.stages.suffix import substring_stage

    corpus, _ = _corpus_ds(sf_dir)
    clusters = fuzzy_dedup(corpus).select_columns(["row_id", "cluster_id"])
    return substring_stage(corpus, clusters, verify_gate="0123")


def _q_substring_spans_blocks(sf_dir: str):
    """Hard-signal oracle for the LCS span kernel (suffix.py): clusters are
    deterministic doc_id blocks of 5 over the documents table, min span 3
    tokens, so the DuckDB side can recompute every longest-common-token-span
    exactly (longest diagonal run of token matches via gaps-and-islands) —
    the kernel is validated rows+hash while ``corpus_substring_spans``
    (spans over real fuzzy clusters) stays the integration surface."""
    import pyarrow as pa
    import ray.data

    from quichash_ray.config import FuzzyConfig
    from quichash_ray.stages.suffix import substring_spans

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def label(b: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(b["doc_id"], np.int64)
        return pa.table(
            {
                "row_id": b["doc_id"],
                "content": b["text"],
                "cluster_id": pa.array(ids // 5, pa.int64()),
            }
        )

    labeled = docs.map_batches(
        label, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    cfg = FuzzyConfig(suffix_min_span_tokens=3, suffix_max_cluster=64)
    return substring_spans(labeled, cfg)


def _q_multimodal_image_features(sf_dir: str):
    """Actor-pool media feature extraction: raw-RGB payload decode + real
    vectorized descriptors (channel stats, luminance histogram, block-mean
    thumbnail); only the compressed-codec decode is absent (no PIL in this
    container). Rows-only."""
    from quichash_ray.stages.multimodal import image_features, synthetic_media

    out = image_features(synthetic_media(200, seed=42))
    import pyarrow as pa

    def drop_list(b: pa.Table) -> pa.Table:
        import numpy as np

        feats = b["features"]
        if isinstance(feats, pa.ChunkedArray):
            feats = feats.combine_chunks()
        mat = np.asarray(feats.values, dtype=np.float32).reshape(len(feats), -1)
        return pa.table(
            {
                "media_id": b["media_id"],
                "kind": b["kind"],
                "feat_dim": pa.array([mat.shape[1]] * len(feats), pa.int64()),
            }
        )

    return out.map_batches(drop_list, batch_format="pyarrow", batch_size=None)


def _q_multimodal_video_frames(sf_dir: str):
    """Actor-pool video frame-sampling: raw elementary-stream decode →
    K evenly-sampled frames, per-frame descriptors, scene-change score,
    sampled-frame digest (the fast-mode sampling pattern applied to
    media). Container codecs decode via PyAV when present (absent here —
    raw layout is the fixture). Rows-only."""
    from quichash_ray.stages.multimodal import (
        synthetic_media,
        video_frame_features,
    )

    clips = synthetic_media(200, seed=42).filter(expr="kind == 'video'")
    out = video_frame_features(clips, n_sample=4)
    # projection, not a map: immune to Ray forwarding empty post-filter
    # blocks around the UDF with their pre-map schema
    return out.select_columns(
        ["media_id", "n_frames", "scene_change", "frame_digest"]
    )


def _q_embedding_recall_report(sf_dir: str):
    """OR-amplified multi-band hyperplane LSH vs exact cosine pairs —
    one-row recall report (recall_bp = basis points). The pytest gate
    holds recall ≥ 0.9 at this config. Exact truth is bounded to a
    512-query md5-order sample (n_query_sample in-row): O(sample·n),
    not O(n²) — the 100-TB-affordable recall estimate."""
    from quichash_ray.pipelines.similarity import embedding_recall_report

    return embedding_recall_report(
        _emb(sf_dir), threshold=0.4, num_planes=4, num_bands=16,
        sample_queries=512,
    )


def _q_ivf_knn_topk(sf_dir: str):
    """IVF pruned top-k (approximate). Rows-only BUT metric-bearing:
    each emitted (query_id, vec_id) row carries exact_hit — 1 iff the
    pair is also in the EXACT brute-force top-k for the same queries
    (knn_topk, itself oracle-checked) — so the recorded value hash pins
    the IVF/exact overlap, not just row counts. At this config the
    pytest gate holds overlap ≥ 0.9."""
    import pyarrow as pa

    from quichash_ray.pipelines.similarity import ivf_knn, knn_topk

    qids = list(range(10))
    out = ivf_knn(_emb(sf_dir), query_ids=qids, k=5, nlist=16, nprobe=8)
    out = out.map_batches(
        lambda b: b.rename_columns(["query_id", "vec_id", "rnk"]),
        batch_format="pyarrow", batch_size=None,
    )
    # exact truth is 50 rows by contract — driver-side set is bounded
    exact = {
        (r["query_id"], r["vec_id"])
        for r in knn_topk(_emb(sf_dir), query_ids=qids, k=5).take_all()
    }

    def mark(b: pa.Table) -> pa.Table:
        hits = [
            int((q, v) in exact)
            for q, v in zip(
                b["query_id"].to_pylist(), b["vec_id"].to_pylist()
            )
        ]
        return b.append_column("exact_hit", pa.array(hits, pa.int64()))

    return out.map_batches(
        mark, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _q_ivf_recall_report(sf_dir: str):
    """IVF (coarse k-means quantizer, nprobe multi-assignment) vs exact
    cosine pairs — one-row recall report. Second ANN scale path beside the
    hyperplane-LSH one; at the loose test threshold (0.4) nprobe=4/16
    cells reaches recall ≥0.98, production near-dup thresholds (≥0.85)
    need nprobe 1-2. Exact truth bounded to a 512-query md5-order
    sample (n_query_sample in-row), as in embedding_recall_report."""
    from quichash_ray.pipelines.similarity import embedding_recall_report

    return embedding_recall_report(
        _emb(sf_dir), threshold=0.4, method="ivf", nlist=16, nprobe=4,
        sample_queries=512,
    )


def _q_repo_neardup(sf_dir: str):
    """Repo-level near-dup (fork detection): Jaccard over per-repo
    distinct file-digest sets, exact via an inverted digest index —
    the file-dedup digest machinery (reference dedup.rs:540-620) lifted
    one level to whole source-code repositories."""
    from quichash_ray.pipelines.derived import repo_forked
    from quichash_ray.pipelines.repodedup import repo_neardup

    return repo_neardup(
        repo_forked(_docs(sf_dir)), threshold_bp=5000, content_col="content"
    )


def _q_lang_dup_stats(sf_dir: str):
    """Per-language dedup report over the north-rule repo corpus shape:
    the analyze semantics (reference analyze.rs:221-293) sliced by the
    `lang` column — one banded digest exchange emitting per-lang
    partials, tiny rollup."""
    from quichash_ray.pipelines.dedup import digest_table, grouped_dup_stats
    from quichash_ray.pipelines.derived import repo_forked

    digests = digest_table(
        repo_forked(_docs(sf_dir)),
        content_col="content",
        key_cols=("lang",),
    )
    return grouped_dup_stats(digests, group_col="lang")


def _q_latest_snapshot(sf_dir: str):
    """Incremental-corpus compaction: keep the max-commit row per
    (repo, path) — the latest-wins primitive before any dedup pass over
    a crawl-and-recrawl / commit-history corpus."""
    from quichash_ray.pipelines.derived import repo_history
    from quichash_ray.pipelines.repodedup import latest_snapshot

    return latest_snapshot(
        repo_history(_docs(sf_dir)),
        key_cols=("repo", "path"),
        version_col="commit",
    )


def _q_pii_scrub(sf_dir: str):
    """PII detection + redaction (emails, IPv4, SSN-shaped ids) over the
    deterministic PII-planted corpus — counts on the original text,
    sequential RE2 redaction; DuckDB oracle runs the same RE2 patterns."""
    from quichash_ray.pipelines.derived import pii_planted
    from quichash_ray.pipelines.pii import pii_scrub

    return pii_scrub(pii_planted(_docs(sf_dir)))


def _q_line_dup_stats(sf_dir: str):
    """Within-document duplicate-line stats over the line-planted corpus
    (docs with boilerplate/newsletter/footer lines planted)."""
    from quichash_ray.pipelines.derived import line_planted
    from quichash_ray.pipelines.linededup import line_stats

    return line_stats(line_planted(_docs(sf_dir)))


def _q_boilerplate_clean(sf_dir: str):
    """Cross-corpus boilerplate-line removal (C4/CCNet-style): drop lines
    whose doc-frequency ≥ 5% of the corpus. Combiner-pattern df count →
    bounded broadcast of the common-line set → vectorized per-doc filter."""
    from quichash_ray.pipelines.derived import line_planted
    from quichash_ray.pipelines.linededup import boilerplate_removal

    docs = _docs(sf_dir)
    return boilerplate_removal(
        line_planted(docs), n_docs=docs.count(), pct=5
    )


def _q_vocab_topk(sf_dir: str):
    """Corpus vocabulary: top-500 whitespace tokens by frequency with a
    deterministic (cnt DESC, token ASC) tie-break — partial per-batch
    counts, vocab-sized shuffle, global sort+limit."""
    from quichash_ray.pipelines.textstats import vocab_topk

    return vocab_topk(_docs(sf_dir), k=500)


def _q_events_asof_join(sf_dir: str):
    """As-of join: every click event attached to the latest purchase by the
    same user at or before the click — one key-hash exchange, pandas
    merge_asof per partition (stages/asofjoin.py). Money as integer cents;
    lag as int64 microseconds; right-side ties broken by max event_id (the
    oracle pre-dedups identically)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from quichash_ray.stages.asofjoin import asof_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    # filtering INSIDE the kernel (not ds.filter) so no empty pre-map
    # blocks reach the tag stage with a stale schema
    def clicks(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sel = b.filter(pc.equal(b["event_type"], "click"))
        return pa.table(
            {
                "event_id": sel["event_id"],
                "ts": sel["ts"],
                "user_id": sel["user_id"],
            }
        )

    def purchases(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sel = b.filter(pc.equal(b["event_type"], "purchase"))
        # half-away-from-zero to match the oracle: DuckDB round() is
        # half-away-from-zero while pc.round defaults to half_to_even —
        # a value*100 landing exactly on .5 would otherwise be 1c off
        cents = pc.cast(
            pc.round(
                pc.multiply(sel["value"], pa.scalar(100.0)),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "purchase_event_id": sel["event_id"],
                "ts": sel["ts"],
                "user_id": sel["user_id"],
                "purchase_ts": sel["ts"],
                "purchase_cents": cents,
            }
        )

    left = ev.map_batches(clicks, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    right = ev.map_batches(
        purchases, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    joined = asof_join(
        left,
        right,
        by="user_id",
        ts_col="ts",
        left_cols=["event_id"],
        right_cols=["purchase_event_id", "purchase_ts", "purchase_cents"],
        tiebreak_col="purchase_event_id",
    )

    def add_lag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "purchase_event_id": pa.array([], pa.int64()),
                    "purchase_cents": pa.array([], pa.int64()),
                    "lag_us": pa.array([], pa.int64()),
                }
            )
        ts_us = np.asarray(b["ts"].combine_chunks().cast(pa.int64()))
        p_ts = b["purchase_ts"].combine_chunks().cast(pa.int64())
        lag = pa.array(ts_us - np.asarray(p_ts.fill_null(0)), pa.int64())
        lag = pa.compute.if_else(p_ts.is_valid(), lag, pa.scalar(None, pa.int64()))
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts": b["ts"],
                "purchase_event_id": b["purchase_event_id"],
                "purchase_cents": b["purchase_cents"],
                "lag_us": lag,
            }
        )

    return joined.map_batches(
        add_lag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup-style embedding dedup: IVF-bucketed cosine near-dup pairs →
    connected components → min-id representative per component, keep flag
    per vector. Rows-only (iterative CC), but every row carries the
    constant agreement_bp column — rep_id agreement vs a brute-force exact
    pipeline — so the record is correctness-bearing; the ≥95% gate also
    lives in tests/test_round3b.py."""
    from quichash_ray.pipelines.similarity import semantic_dedup_report

    return semantic_dedup_report(
        _emb(sf_dir), threshold=0.4, nlist=16, nprobe=4
    )


def _q_hash_sample(sf_dir: str):
    """Deterministic 20% Bernoulli sample keyed on md5(doc_id) — resumable
    and auditable (a re-run keeps the same rows); zero shuffles."""
    from quichash_ray.pipelines.sampling import hash_sample

    return hash_sample(_docs(sf_dir), rate_bp=2000)


def _q_cap_per_source(sf_dir: str):
    """MassiveText-style per-source capping: keep ≤10 docs per source,
    chosen by (md5(doc_id), doc_id) order — only keys ride the exchange."""
    from quichash_ray.pipelines.sampling import cap_per_group

    return cap_per_group(_docs(sf_dir), group_col="source", k=10)


def _q_incremental_dedup(sf_dir: str):
    """Tiered incremental dedup: classify a new crawl shard against the
    existing corpus's digest table. Runs the BLOOM tier explicitly (the
    100-TB path: distributed bitmap + positives-only exact verify, zero
    shuffles); the three tiers are equivalence-tested in
    tests/test_incremental.py."""
    from quichash_ray.pipelines.dedup import digest_table
    from quichash_ray.pipelines.derived import incremental_new
    from quichash_ray.pipelines.incremental import incremental_dedup

    old = digest_table(
        _docs(sf_dir), content_col="text", key_cols=("doc_id",)
    )
    new = incremental_new(_docs(sf_dir))
    return incremental_dedup(new, old, tier="bloom")


def _q_chunk_dedup_stats(sf_dir: str):
    """Chunk-granularity dedup stats (64-char chunks) over the
    dup-planted corpus — the storage-style sub-file dedup-ratio report,
    reusing the banded analyze machinery over chunk digests."""
    from quichash_ray.pipelines.chunkdedup import chunk_dedup_stats
    from quichash_ray.pipelines.derived import dup_planted

    return chunk_dedup_stats(dup_planted(_docs(sf_dir)), chunk_chars=64)


def _q_cdc_dedup_stats(sf_dir: str):
    """Content-defined-chunk dedup stats (vectorized gear hash, high-bit
    mask, expected 64-B chunks) over the dup-planted corpus — rows-only
    (a rolling gear hash is not SQL-expressible); the vectorized-vs-
    sequential equality and insertion-robustness properties are gated in
    tests/test_chunkdedup.py."""
    from quichash_ray.pipelines.chunkdedup import cdc_dedup_stats
    from quichash_ray.pipelines.derived import dup_planted

    return cdc_dedup_stats(dup_planted(_docs(sf_dir)), mask_bits=6)


def _q_ngram_decontaminate(sf_dir: str):
    """GPT-3-style 13-gram overlap decontamination: train docs sharing
    any 13-token-gram with the quote-planted eval corpus, with distinct
    shared-gram counts. Broadcast tier here; the co-partitioned join
    tier is equivalence-tested in tests/test_ngram_decontam.py."""
    from quichash_ray.pipelines.decontam import ngram_decontaminate
    from quichash_ray.pipelines.derived import quote_eval

    docs = _docs(sf_dir)
    return ngram_decontaminate(docs, quote_eval(docs), k=13)


def _q_comment_scrub(sf_dir: str):
    """Code-comment analysis/stripping: block → // → # staged RE2 removal
    with per-style counts; engine and oracle share the patterns."""
    from quichash_ray.pipelines.codeclean import comment_scrub
    from quichash_ray.pipelines.derived import code_planted

    return comment_scrub(code_planted(_docs(sf_dir)))


def _q_pack_sequences(sf_dir: str):
    """GPT-style sequence-packing plan: global token offsets (distributed
    exclusive prefix sum over the id-sorted token stream) and the ctx=512
    windows each document spans."""
    from quichash_ray.pipelines.packing import pack_sequences

    return pack_sequences(_docs(sf_dir), ctx_len=512)


def _q_winnow_fingerprints(sf_dir: str):
    """MOSS winnowing (Schleimer et al. 2003): token-3-gram md5 hashes,
    window-4 robust winnowing (min hash, rightmost tie) — the code-clone
    fingerprint table over the clone-planted corpus."""
    from quichash_ray.pipelines.derived import clone_planted
    from quichash_ray.pipelines.winnow import winnow_fingerprints

    return winnow_fingerprints(clone_planted(_docs(sf_dir)), k=3, w=4)


def _q_clone_pairs(sf_dir: str):
    """Clone-candidate pairs: documents sharing ≥2 winnowed k=5-gram
    fingerprints, counted through the banded inverted-index exchange.
    k=5 + fp_cap=64 because the synthetic docs draw from a ~30-word
    vocabulary: 3-gram fingerprints collide across thousands of docs at
    sf0.1 and the coincidental pair set goes quadratic; 5-grams keep the
    planted clones' long shared runs (df≈2, under any cap) while the df
    cap meters out the word-salad hot spots — mirrored exactly in the
    oracle (as repo_neardup does)."""
    from quichash_ray.pipelines.derived import clone_planted
    from quichash_ray.pipelines.winnow import clone_pairs

    return clone_pairs(
        clone_planted(_docs(sf_dir)), k=5, w=4, min_shared=2, fp_cap=64
    )


def _q_normalized_dedup(sf_dir: str):
    """Normalized (canonical-text) exact dedup — the C4-style tier between
    byte-exact and fuzzy dedup: case/punctuation/whitespace variants
    collapse to one canonical form and dedup on its md5. Run over the
    case-variant scenario (doc_id%6==0 docs get an upper-cased,
    punctuation-wrapped copy that byte-exact dedup misses)."""
    from quichash_ray.pipelines.derived import case_variants
    from quichash_ray.pipelines.normdedup import normalized_dup_groups

    return normalized_dup_groups(case_variants(_docs(sf_dir)))


def _q_normalized_keep_best(sf_dir: str):
    """Quality-aware normalized dedup: per canonical-text group keep the
    LONGEST member (ties → smallest id) via an int64-packed (len, id)
    argmax that rides inside one Count/Max groupby — no join-back pass.
    Over the case-variant scenario the kept copy is the wrapped variant
    (5 chars longer), exercising keep-best ≠ keep-first."""
    from quichash_ray.pipelines.derived import case_variants
    from quichash_ray.pipelines.normdedup import normalized_keep_best

    return normalized_keep_best(case_variants(_docs(sf_dir)))


def _q_rare_token_stats(sf_dir: str):
    """Per-doc corpus-frequency token stats (unigram quality signal):
    n_tok, rare-instance count (corpus freq ≤ 2), rarest-token freq,
    mean corpus freq (one double division of int64 sums). One
    token-hash exchange — a token partition holds all instances of its
    tokens, so global freqs are computed locally, no join."""
    from quichash_ray.pipelines.textstats import rare_token_stats

    return rare_token_stats(_docs(sf_dir), rare_max=2)


def _q_length_quantile_filter(sf_dir: str):
    """Corpus-adaptive length filter: keep docs inside the corpus's own
    [p10, p99] token-length quantiles — exact thresholds from the
    bounded distinct-length histogram, then one streaming filter."""
    from quichash_ray.pipelines.textstats import length_quantile_filter

    return length_quantile_filter(_docs(sf_dir), 0.10, 0.99)


def _q_similar_docs_topk(sf_dir: str):
    """Per-doc similar-document search: top-3 most similar docs by
    5-gram Jaccard among ≥1-shared-gram candidates — ranking by one
    double division of the same int64s on both sides (bit-identical),
    ties to smaller other_id. gram_cap=None because the DuckDB oracle
    computes UNCAPPED pair counts (same convention as ngram_jaccard /
    containment_pairs)."""
    from quichash_ray.pipelines.ngram import similar_docs_topk

    return similar_docs_topk(_docs(sf_dir), k_top=3, gram_cap=None)


def _q_hash_split(sf_dir: str):
    """Deterministic 90/5/5 train/val/test split by md5(id) bucket —
    resume/audit-safe (same id → same split on every run and
    partitioning), zero shuffles, one streaming pass."""
    from quichash_ray.pipelines.sampling import hash_split

    return hash_split(
        _docs(sf_dir), [("train", 9000), ("val", 500), ("test", 500)]
    )


def _q_bpe_pair_counts(sf_dir: str):
    """BPE merge-step primitive: top-200 most frequent adjacent token
    pairs (combiner pattern — shuffle carries pair-vocabulary partial
    counts, never token instances), deterministic (cnt DESC, pair ASC)."""
    from quichash_ray.pipelines.textstats import bpe_pair_counts

    return bpe_pair_counts(_docs(sf_dir), k=200)


def _q_doc_length_quantiles(sf_dir: str):
    """Exact discrete token-length quantiles (p10..p99) via the bounded
    value-count combiner; matches DuckDB quantile_disc bit-for-bit."""
    from quichash_ray.pipelines.textstats import doc_length_quantiles

    return doc_length_quantiles(_docs(sf_dir))


def _q_fuzzy_decontaminate(sf_dir: str):
    """Shingle-containment decontamination: the fuzzy_eval scenario plants
    10%-token-deleted copies of doc_id%11==0 docs as the eval set — no
    shared verbatim 13-gram survives, but ≥half their 5-gram shingles do;
    a train doc is contaminated when 2·shared ≥ n_eval (int64-exact)."""
    from quichash_ray.pipelines.decontam import fuzzy_decontaminate
    from quichash_ray.pipelines.derived import fuzzy_eval

    docs = _docs(sf_dir)
    return fuzzy_decontaminate(
        docs, fuzzy_eval(docs), k=5, threshold_num=1, threshold_den=2
    )


def _q_events_interval_join(sf_dir: str):
    """Interval (range) join: every event attached to EVERY 30-minute
    incident window opened by an 'error' event of the same user —
    many-to-many containment (lo <= ts < hi), one key-hash exchange,
    vectorized banded sweep per partition (stages/intervaljoin.py).
    Overlapping windows (two errors within 30 min) genuinely multiply."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from quichash_ray.stages.intervaljoin import interval_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def incidents(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sel = b.filter(pc.equal(b["event_type"], "error"))
        lo = sel["ts"]
        hi = pc.add(
            pc.cast(lo, pa.timestamp("us")),
            pa.scalar(30 * 60 * 1_000_000, pa.duration("us")),
        )
        return pa.table(
            {
                "incident_id": sel["event_id"],
                "user_id": sel["user_id"],
                "lo": pc.cast(lo, pa.timestamp("us")),
                "hi": hi,
            }
        )

    inc = ev.map_batches(
        incidents, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    joined = interval_join(
        ev,
        inc,
        by="user_id",
        ts_col="ts",
        lo_col="lo",
        hi_col="hi",
        left_cols=["event_id", "event_type"],
        right_cols=["incident_id"],
    )

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lag = pc.subtract(
            pc.cast(pc.cast(b["ts"], pa.timestamp("us")), pa.int64()),
            pc.cast(pc.cast(b["lo"], pa.timestamp("us")), pa.int64()),
        )
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts": b["ts"],
                "event_type": b["event_type"],
                "incident_id": b["incident_id"],
                "lag_us": pc.cast(lag, pa.int64()),
            }
        )

    return joined.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def _q_tfidf_top_terms(sf_dir: str):
    """Per-doc top-5 terms by tf·idf (rational idf 1/df): one vocab-sized
    combiner shuffle for df (only df≥2 tokens broadcast — a miss means
    df=1), then docs stream once more with the top-k taken in-batch."""
    from quichash_ray.pipelines.textstats import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir), k_top=5)


_MIX_WEIGHTS = {"src0": 5000, "src1": 3000, "src2": 2000}


def _q_mix_to_weights(sf_dir: str):
    """Deterministic domain-mixing sampler: down-sample to a 50/30/20
    src0/src1/src2 mix, integer-exact sizing, md5(id)-ranked picks."""
    from quichash_ray.pipelines.sampling import mix_to_weights

    return mix_to_weights(_docs(sf_dir), _MIX_WEIGHTS)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "corpus_fuzzy_clusters": _q_corpus_fuzzy_clusters,
        "repo_neardup": _q_repo_neardup,
        "lang_dup_stats": _q_lang_dup_stats,
        "latest_snapshot": _q_latest_snapshot,
        "corpus_recall_report": _q_corpus_recall_report,
        "corpus_substring_spans": _q_corpus_substring_spans,
        "substring_spans_blocks": _q_substring_spans_blocks,
        "fast_mode_digest": _q_fast_mode_digest,
        "top_wasted_groups": _q_top_wasted_groups,
        "events_window_agg": _q_events_window_agg,
        "events_sessionize": _q_events_sessionize,
        "events_hopping_agg": _q_events_hopping_agg,
        "multimodal_image_features": _q_multimodal_image_features,
        "multimodal_video_frames": _q_multimodal_video_frames,
        "embedding_recall_report": _q_embedding_recall_report,
        "ivf_recall_report": _q_ivf_recall_report,
        "ivf_knn_topk": _q_ivf_knn_topk,
        "exact_dup_groups": _q_exact_dup_groups,
        "dedup_keep_first": _q_dedup_keep_first,
        "analyze_stats": _q_analyze_stats,
        "verify_classify": _q_verify,
        "verify_mixed": _q_verify_mixed,
        "compare_classify": _q_compare,
        "moved_files": _q_moved,
        "multi_digest": _q_multi_digest,
        "text_quality": _q_text_quality,
        "language_id": _q_language_id,
        "fingerprints": _q_fingerprints,
        "ngram_jaccard": _q_ngram_jaccard,
        "token_counts": _q_token_counts,
        "gopher_quality": _q_gopher_quality,
        "decontaminate": _q_decontaminate,
        "clean_corpus": _q_clean_corpus,
        "knn_topk": _q_knn_topk,
        "embedding_neardup": _q_embedding_neardup,
        "pii_scrub": _q_pii_scrub,
        "line_dup_stats": _q_line_dup_stats,
        "boilerplate_clean": _q_boilerplate_clean,
        "vocab_topk": _q_vocab_topk,
        "events_asof_join": _q_events_asof_join,
        "hash_sample": _q_hash_sample,
        "cap_per_source": _q_cap_per_source,
        "semantic_dedup": _q_semantic_dedup,
        "incremental_dedup": _q_incremental_dedup,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "clone_pairs": _q_clone_pairs,
        "pack_sequences": _q_pack_sequences,
        "comment_scrub": _q_comment_scrub,
        "containment_pairs": _q_containment_pairs,
        "ngram_decontaminate": _q_ngram_decontaminate,
        "chunk_dedup_stats": _q_chunk_dedup_stats,
        "cdc_dedup_stats": _q_cdc_dedup_stats,
        "normalized_dedup": _q_normalized_dedup,
        "bpe_pair_counts": _q_bpe_pair_counts,
        "doc_length_quantiles": _q_doc_length_quantiles,
        "fuzzy_decontaminate": _q_fuzzy_decontaminate,
        "events_interval_join": _q_events_interval_join,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "mix_to_weights": _q_mix_to_weights,
        "normalized_keep_best": _q_normalized_keep_best,
        "hash_split": _q_hash_split,
        "similar_docs_topk": _q_similar_docs_topk,
        "length_quantile_filter": _q_length_quantile_filter,
        "rare_token_stats": _q_rare_token_stats,
        "events_debounce": _q_events_debounce,
        "events_outliers": _q_events_outliers,
        "profile_documents": _q_profile_documents,
        "rollup_stats": _q_rollup_stats,
        "lang_length_quantiles": _q_lang_length_quantiles,
        "ngram_novelty": _q_ngram_novelty,
        "tpch_pricing_summary": _q_tpch_pricing_summary,
        "tpch_top_orders": _q_tpch_top_orders,
        "tpch_revenue_by_nation": _q_tpch_revenue_by_nation,
        "chunk_documents": _q_chunk_documents,
        "dup_size_histogram": _q_dup_size_histogram,
        "top_quality_per_source": _q_top_quality_per_source,
        "tpch_late_orders": _q_tpch_late_orders,
        "events_running_total": _q_events_running_total,
        "users_per_event_type": _q_users_per_event_type,
        "tpch_promo_share": _q_tpch_promo_share,
        "suppliers_per_region": _q_suppliers_per_region,
        "events_recent_topk": _q_events_recent_topk,
        "events_value_rank": _q_events_value_rank,
        "events_lag_delta": _q_events_lag_delta,
        "tpch_nation_pair_volume": _q_tpch_nation_pair_volume,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; views pre-registered per table name)
# ---------------------------------------------------------------------------

from quichash_ray.pipelines.derived import (  # noqa: E402
    CASE_VARIANTS_SQL,
    CLONE_PLANTED_SQL,
    CODE_PLANTED_SQL,
    COMPARE_SCENARIO_SQL,
    DUP_PLANTED_SQL,
    FUZZY_EVAL_SQL,
    INCREMENTAL_NEW_SQL,
    LINE_PLANTED_SQL,
    MIXED_VERIFY_SCENARIO_SQL,
    PII_PLANTED_SQL,
    QUOTE_EVAL_SQL,
    REPO_FORKED_SQL,
    REPO_HISTORY_SQL,
    VERIFY_SCENARIO_SQL,
)


# winnowing CTE chain shared by the clone-detection oracles: token
# k-grams (md5 hex), window-w robust winnowing realized as the min of the
# 39-char combined key hex || zfill7(9999999 - i) per window (lexicographic
# hex order == numeric; inverted position suffix → rightmost tie), DISTINCT
# (pos, fp) per doc — the literal mirror of pipelines/winnow.py.
def _winnow_fps_sql(k: int, w: int) -> str:
    return rf"""
toks AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM cp
  WHERE text IS NOT NULL
),
grams AS (
  SELECT t.doc_id, g.i,
         md5(array_to_string(t.tk[g.i + 1 : g.i + {k}], ' ')) AS h
  FROM toks t,
       LATERAL (SELECT unnest(generate_series(0, len(t.tk) - {k})) AS i) g
),
nstats AS (
  SELECT doc_id, len(tk) - {k - 1} AS n FROM toks WHERE len(tk) >= {k}
),
starts AS (
  SELECT n.doc_id, s.s
  FROM nstats n,
       LATERAL (
         SELECT unnest(generate_series(0, greatest(0, n.n - {w}))) AS s
       ) s
),
sel AS (
  SELECT g.doc_id, st.s,
         min(g.h || lpad(CAST(9999999 - g.i AS VARCHAR), 7, '0')) AS c
  FROM starts st
  JOIN grams g ON g.doc_id = st.doc_id AND g.i >= st.s AND g.i < st.s + {w}
  GROUP BY g.doc_id, st.s
),
wfps AS (
  SELECT DISTINCT doc_id,
         CAST(9999999 - CAST(c[33:] AS INT) AS BIGINT) AS pos,
         c[1:32] AS fp
  FROM sel
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        # MOSS winnowing fingerprint table (k=3 token grams, w=4 windows)
        "winnow_fingerprints": f"""
            WITH {CLONE_PLANTED_SQL.strip().rstrip()},
            {_winnow_fps_sql(3, 4).strip().rstrip()}
            SELECT doc_id, pos, fp FROM wfps
        """,
        # clone candidates: pairs sharing >= 2 winnowed k=5 fingerprints;
        # fingerprints hotter than df 64 dropped on BOTH sides (the
        # engine meters the drop, the CTE mirrors it)
        "clone_pairs": f"""
            WITH {CLONE_PLANTED_SQL.strip().rstrip()},
            {_winnow_fps_sql(5, 4).strip().rstrip()},
            fpd AS (SELECT DISTINCT doc_id, fp FROM wfps),
            dfc AS (SELECT fp, count(*) AS c FROM fpd GROUP BY fp),
            fpk AS (
              SELECT fpd.doc_id, fpd.fp FROM fpd
              JOIN dfc ON dfc.fp = fpd.fp WHERE dfc.c <= 64
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   count(*)::BIGINT AS shared
            FROM fpk a JOIN fpk b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        # chunk-granularity analyze: the file-analyze semantics over
        # fixed 64-char chunk digests of the dup-planted corpus
        "chunk_dedup_stats": f"""
            WITH {DUP_PLANTED_SQL.strip().rstrip()},
            docs AS (
              SELECT text, length(text) AS L FROM d
              WHERE text IS NOT NULL AND length(text) > 0
            ),
            chunks AS (
              SELECT substr(text, g.i * 64 + 1, 64) AS c
              FROM docs,
                   LATERAL (
                     SELECT unnest(generate_series(0, (L - 1) // 64)) AS i
                   ) g
            ),
            per AS (
              SELECT sha256(c) AS dg, count(*) AS cnt,
                     min(strlen(c)) AS sz
              FROM chunks GROUP BY 1
            )
            SELECT sum(cnt)::BIGINT AS total_files,
                   sum(cnt * sz)::BIGINT AS total_bytes,
                   count(*)::BIGINT AS unique_hashes,
                   (count(*) FILTER (cnt > 1))::BIGINT AS dup_groups,
                   (coalesce(sum(cnt) FILTER (cnt > 1), 0))::BIGINT
                       AS dup_files,
                   (coalesce(sum((cnt-1) * sz) FILTER (cnt > 1), 0))::BIGINT
                       AS wasted_bytes
            FROM per
        """,
        # 13-gram overlap decontamination vs the quote-planted eval set:
        # distinct shared-gram counts per contaminated train doc
        "ngram_decontaminate": f"""
            WITH {QUOTE_EVAL_SQL.strip().rstrip()},
            ttk AS (
              SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk
              FROM documents WHERE text IS NOT NULL
            ),
            tg AS (
              SELECT DISTINCT t.doc_id,
                     md5(array_to_string(t.tk[g.i+1 : g.i+13], ' ')) AS h
              FROM ttk t,
                   LATERAL (
                     SELECT unnest(generate_series(0, len(t.tk)-13)) AS i
                   ) g
            ),
            etk AS (
              SELECT regexp_extract_all(text, '\\S+') AS tk FROM qe
            ),
            eg AS (
              SELECT DISTINCT
                     md5(array_to_string(e.tk[g.i+1 : g.i+13], ' ')) AS h
              FROM etk e,
                   LATERAL (
                     SELECT unnest(generate_series(0, len(e.tk)-13)) AS i
                   ) g
            )
            SELECT tg.doc_id, count(*)::BIGINT AS n_shared
            FROM tg JOIN eg USING (h) GROUP BY tg.doc_id
        """,
        # staged comment stripping: block -> // -> #, counts taken on the
        # previous stage's stripped text; comment_chars telescopes to
        # len(text) - len(clean)
        "comment_scrub": f"""
            WITH {CODE_PLANTED_SQL.strip().rstrip()},
            s1 AS (
              SELECT doc_id, text,
                     regexp_replace(text,
                       '/\\*([^*]|\\*+[^*/])*\\*+/', '', 'g') AS t1,
                     len(regexp_extract_all(text,
                       '/\\*([^*]|\\*+[^*/])*\\*+/')) AS n_block
              FROM cpd
            ),
            s2 AS (
              SELECT *, regexp_replace(t1, '//[^\n]*', '', 'g') AS t2,
                     len(regexp_extract_all(t1, '//[^\n]*')) AS n_line
              FROM s1
            ),
            s3 AS (
              SELECT *, regexp_replace(t2, '#[^\n]*', '', 'g') AS t3,
                     len(regexp_extract_all(t2, '#[^\n]*')) AS n_hash
              FROM s2
            )
            SELECT doc_id,
                   COALESCE(n_block, 0)::BIGINT AS n_block,
                   COALESCE(n_line, 0)::BIGINT AS n_line,
                   COALESCE(n_hash, 0)::BIGINT AS n_hash,
                   COALESCE(length(text) - length(t3), 0)::BIGINT
                       AS comment_chars,
                   t3 AS clean_text
            FROM s3
        """,
        # sequence-packing plan: window cumsum mirrors the distributed
        # exclusive prefix sum; all-integer columns
        "pack_sequences": r"""
            WITH t AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens
              FROM documents WHERE text IS NOT NULL
            ),
            c AS (
              SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0)::BIGINT AS start_tok
              FROM t WHERE n_tokens >= 1
            )
            SELECT doc_id, n_tokens, start_tok,
                   (start_tok // 512)::BIGINT AS first_seq,
                   ((start_tok + n_tokens - 1) // 512)::BIGINT AS last_seq,
                   ((start_tok + n_tokens - 1) // 512
                    - start_tok // 512 + 1)::BIGINT AS n_seqs
            FROM c
        """,
        # tiered incremental dedup: dup/novel by actual digest membership
        # against the old corpus (both sides decide by sha256 equality, not
        # by the scenario's mutation rule)
        "incremental_dedup": f"""
            WITH {INCREMENTAL_NEW_SQL.strip().rstrip()},
            old AS (
              SELECT DISTINCT sha256(text) AS dg FROM documents
              WHERE text IS NOT NULL
            )
            SELECT n.doc_id,
                   CASE WHEN o.dg IS NOT NULL THEN 'dup'
                        ELSE 'novel' END AS status
            FROM nc n LEFT JOIN old o ON sha256(n.text) = o.dg
        """,
        # repo-pair Jaccard over distinct file-digest sets; the df cap
        # (256) and the threshold use integer arithmetic on both sides so
        # the comparison is hash-exact
        "repo_neardup": f"""
            WITH {REPO_FORKED_SQL.strip().rstrip()},
            fd AS (SELECT DISTINCT repo, sha256(content) AS dg FROM rp),
            dfc AS (SELECT dg, count(*) AS c FROM fd GROUP BY dg),
            fdf AS (
              SELECT fd.repo, fd.dg FROM fd
              JOIN dfc ON dfc.dg = fd.dg WHERE dfc.c <= 256
            ),
            sizes AS (
              SELECT repo, count(*)::BIGINT AS sz FROM fdf GROUP BY repo
            ),
            inter AS (
              SELECT a.repo AS repo_a, b.repo AS repo_b,
                     count(*)::BIGINT AS inter
              FROM fdf a JOIN fdf b ON a.dg = b.dg AND a.repo < b.repo
              GROUP BY 1, 2
            )
            SELECT repo_a, repo_b, inter,
                   (sa.sz + sb.sz - inter) AS union_cnt,
                   ((10000 * inter) // (sa.sz + sb.sz - inter)) AS jacc_bp,
                   ((10000 * inter) // least(sa.sz, sb.sz)) AS cont_bp
            FROM inter
            JOIN sizes sa ON sa.repo = inter.repo_a
            JOIN sizes sb ON sb.repo = inter.repo_b
            WHERE 10000 * inter >= 5000 * (sa.sz + sb.sz - inter)
        """,
        # analyze semantics sliced by lang over the full repo-corpus
        # shape; dup groups counted within a lang
        "lang_dup_stats": f"""
            WITH {REPO_FORKED_SQL.strip().rstrip()},
            per AS (
                SELECT lang, sha256(content) AS dg, count(*) AS cnt,
                       min(strlen(content)) AS sz
                FROM rp GROUP BY 1, 2
            )
            SELECT lang,
                   sum(cnt)::BIGINT AS total_files,
                   sum(cnt * sz)::BIGINT AS total_bytes,
                   count(*)::BIGINT AS unique_hashes,
                   (count(*) FILTER (cnt > 1))::BIGINT AS dup_groups,
                   (coalesce(sum(cnt) FILTER (cnt > 1), 0))::BIGINT
                       AS dup_files,
                   (coalesce(sum((cnt-1) * sz) FILTER (cnt > 1), 0))::BIGINT
                       AS wasted_bytes
            FROM per GROUP BY lang
        """,
        # latest-wins compaction: rows carrying the max commit per
        # (repo, path)
        "latest_snapshot": f"""
            WITH {REPO_HISTORY_SQL.strip().rstrip()}
            SELECT rh.repo, rh.path, rh.commit, rh.content
            FROM rh
            JOIN (
                SELECT repo, path, max(commit) AS mc
                FROM rh GROUP BY 1, 2
            ) w ON rh.repo = w.repo AND rh.path = w.path
               AND rh.commit = w.mc
        """,
        # longest common token span per in-block doc pair: token matches on
        # each (i - j) diagonal form runs (gaps-and-islands); the longest
        # run IS the longest common token span — exact ground truth for the
        # rolling-hash binary-search kernel in stages/suffix.py
        "substring_spans_blocks": r"""
            WITH docs AS (
              SELECT doc_id,
                     list_filter(
                       string_split_regex(text, '[ \n\t]+'), t -> t <> ''
                     ) AS toks
              FROM documents
            ),
            toks AS (
              SELECT doc_id, unnest(toks) AS tok,
                     unnest(range(len(toks))) AS pos
              FROM docs
            ),
            pairs AS (
              SELECT a.doc_id AS ida, b.doc_id AS idb
              FROM documents a JOIN documents b
              ON a.doc_id // 5 = b.doc_id // 5 AND a.doc_id < b.doc_id
            ),
            matches AS (
              SELECT p.ida, p.idb, ta.pos AS i, ta.pos - tb.pos AS diag
              FROM pairs p
              JOIN toks ta ON ta.doc_id = p.ida
              JOIN toks tb ON tb.doc_id = p.idb AND tb.tok = ta.tok
            ),
            runs AS (
              SELECT ida, idb, count(*) AS runlen
              FROM (
                SELECT ida, idb, diag,
                       i - row_number() OVER (
                         PARTITION BY ida, idb, diag ORDER BY i
                       ) AS grp
                FROM matches
              )
              GROUP BY ida, idb, diag, grp
            ),
            spans AS (
              SELECT ida, idb, max(runlen) AS span FROM runs GROUP BY ida, idb
            )
            SELECT ida // 5 AS cluster_id, ida AS id_a, idb AS id_b,
                   CAST(span AS BIGINT) AS span_tokens
            FROM spans WHERE span >= 3
        """,
        "exact_dup_groups": f"""
            WITH {DUP_PLANTED_SQL}
            SELECT sha256(text) AS digest,
                   count(*)::BIGINT AS cnt,
                   min(strlen(text))::BIGINT AS size,
                   min(path) AS rep,
                   ((count(*) - 1) * min(strlen(text)))::BIGINT AS wasted
            FROM d GROUP BY 1 HAVING count(*) > 1
        """,
        "dedup_keep_first": f"""
            WITH {DUP_PLANTED_SQL}
            SELECT sha256(text) AS digest, min(path) AS path
            FROM d GROUP BY 1
        """,
        "analyze_stats": f"""
            WITH {DUP_PLANTED_SQL},
            per AS (
                SELECT sha256(text) AS dg, count(*) AS cnt,
                       min(strlen(text)) AS sz
                FROM d GROUP BY 1
            )
            SELECT sum(cnt)::BIGINT AS total_files,
                   sum(cnt * sz)::BIGINT AS total_bytes,
                   count(*)::BIGINT AS unique_hashes,
                   (count(*) FILTER (cnt > 1))::BIGINT AS dup_groups,
                   (coalesce(sum(cnt) FILTER (cnt > 1), 0))::BIGINT AS dup_files,
                   (coalesce(sum((cnt-1) * sz) FILTER (cnt > 1), 0))::BIGINT
                       AS wasted_bytes
            FROM per
        """,
        "verify_classify": f"""
            WITH {DUP_PLANTED_SQL},
            {VERIFY_SCENARIO_SQL}
            SELECT coalesce(s.path, c.path) AS path,
                   CASE WHEN s.digest IS NOT NULL AND c.digest IS NOT NULL
                             AND s.digest = c.digest THEN 'match'
                        WHEN s.digest IS NOT NULL AND c.digest IS NOT NULL
                             THEN 'mismatch'
                        WHEN s.digest IS NOT NULL THEN 'missing'
                        ELSE 'new' END AS status,
                   s.digest AS expected,
                   c.digest AS actual
            FROM stored s FULL OUTER JOIN current c ON s.path = c.path
        """,
        "verify_mixed": f"""
            WITH {DUP_PLANTED_SQL},
            {MIXED_VERIFY_SCENARIO_SQL}
            SELECT coalesce(s.path, c.path) AS path,
                   CASE WHEN s.path IS NOT NULL AND c.path IS NOT NULL THEN
                            CASE WHEN r.actual = s.digest THEN 'match'
                                 ELSE 'mismatch' END
                        WHEN s.path IS NOT NULL THEN 'missing'
                        ELSE 'new' END AS status,
                   s.digest AS expected,
                   CASE WHEN s.path IS NOT NULL AND c.path IS NOT NULL
                        THEN r.actual END AS actual
            FROM stored s FULL OUTER JOIN cur c ON s.path = c.path
            LEFT JOIN redigest r ON r.path = coalesce(s.path, c.path)
        """,
        "compare_classify": f"""
            WITH {COMPARE_SCENARIO_SQL}
            SELECT coalesce(a.path, b.path) AS path,
                   CASE WHEN a.digest IS NOT NULL AND b.digest IS NOT NULL
                             AND a.digest = b.digest THEN 'unchanged'
                        WHEN a.digest IS NOT NULL AND b.digest IS NOT NULL
                             THEN 'changed'
                        WHEN a.digest IS NOT NULL THEN 'removed'
                        ELSE 'added' END AS status,
                   a.digest AS digest1,
                   b.digest AS digest2
            FROM db1 a FULL OUTER JOIN db2 b ON a.path = b.path
        """,
        "moved_files": f"""
            WITH {COMPARE_SCENARIO_SQL},
            removed AS (
                SELECT a.path, a.digest FROM db1 a
                LEFT JOIN db2 b ON a.path = b.path WHERE b.path IS NULL
            ),
            added AS (
                SELECT b.path, b.digest FROM db2 b
                LEFT JOIN db1 a ON a.path = b.path WHERE a.path IS NULL
            )
            SELECT r.digest AS digest, r.path AS old_path, a.path AS new_path
            FROM removed r JOIN added a ON r.digest = a.digest
        """,
        "fast_mode_digest": """
            SELECT doc_id,
                   sha256(CASE WHEN strlen(text) < 192 THEN text
                          ELSE substr(text, 1, 64)
                               || substr(text, strlen(text)//2 - 31, 64)
                               || substr(text, strlen(text) - 63, 64)
                          END) AS fast_digest,
                   TRUE AS fast_mode
            FROM documents
        """,
        "top_wasted_groups": f"""
            WITH {DUP_PLANTED_SQL},
            grp AS (
                SELECT sha256(text) AS digest,
                       count(*)::BIGINT AS cnt,
                       min(strlen(text))::BIGINT AS size,
                       min(path) AS rep,
                       ((count(*) - 1) * min(strlen(text)))::BIGINT AS wasted
                FROM d GROUP BY 1 HAVING count(*) > 1
            )
            SELECT * FROM grp ORDER BY wasted DESC, digest ASC LIMIT 10
        """,
        "events_sessionize": """
            WITH marks AS (
                SELECT user_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS ns
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            )
            SELECT user_id, sum(ns)::BIGINT AS n_sessions,
                   count(*)::BIGINT AS n_events
            FROM marks GROUP BY 1
        """,
        "events_hopping_agg": """
            SELECT ws AS window_start, event_type,
                   count(*)::BIGINT AS cnt,
                   round(sum(value) * 100)::BIGINT AS sum_cents
            FROM (
                SELECT date_trunc('hour', ts) AS ws, event_type, value
                FROM events
                UNION ALL
                SELECT date_trunc('hour', ts - INTERVAL 30 MINUTE)
                           + INTERVAL 30 MINUTE AS ws,
                       event_type, value
                FROM events
            ) GROUP BY 1, 2
        """,
        "events_window_agg": """
            SELECT date_trunc('hour', ts) AS window_start,
                   event_type,
                   count(*)::BIGINT AS cnt,
                   round(sum(value) * 100)::BIGINT AS sum_cents
            FROM events GROUP BY 1, 2
        """,
        "multi_digest": """
            SELECT doc_id, md5(text) AS md5, sha256(text) AS sha256
            FROM documents
        """,
        "text_quality": r"""
            SELECT doc_id,
                   length(text)::BIGINT AS n_chars,
                   len(regexp_extract_all(text, '\S+'))::BIGINT AS n_tokens,
                   len(regexp_extract_all(text, '[A-Za-z]'))::BIGINT
                       AS alpha_chars,
                   len(regexp_extract_all(text, '[0-9]'))::BIGINT
                       AS digit_chars
            FROM documents
        """,
        "language_id": r"""
            WITH s AS (
                SELECT doc_id,
                    len(regexp_extract_all(text, '\b(the|a|of|to|and|in|is)\b'))::BIGINT AS score_en,
                    len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht)\b'))::BIGINT AS score_de,
                    len(regexp_extract_all(text, '\b(le|la|les|et|est|une)\b'))::BIGINT AS score_fr
                FROM documents
            )
            SELECT doc_id, score_en, score_de, score_fr,
                   CASE WHEN score_fr > greatest(score_en, score_de) THEN 'fr'
                        WHEN score_de > score_en THEN 'de'
                        ELSE 'en' END AS pred_lang
            FROM s
        """,
        "fingerprints": r"""
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                       AS fingerprint
            FROM documents
        """,
        "gopher_quality": r"""
            WITH toks AS (
                SELECT doc_id, text, regexp_extract_all(text, '\S+') AS t
                FROM documents
            ),
            idx AS (
                SELECT doc_id, t,
                       unnest(range(1, greatest(len(t) - 1, 1))) AS i
                FROM toks
            ),
            g3 AS (
                SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
                FROM idx
            ),
            dist AS (SELECT doc_id, count(DISTINCT g) AS d3 FROM g3 GROUP BY 1),
            base AS (
                SELECT k.doc_id,
                       len(k.t) AS n_tok,
                       len(regexp_extract_all(k.text, '\b(the|a|an|of|to|and|in|is|it|that|for|on|with|as|at|by|be|this|are|or)\b'))
                           AS sw_hits,
                       CASE WHEN len(k.t) >= 3
                            THEN (10000 * (len(k.t) - 2 - coalesce(di.d3, 0)))
                                 // (len(k.t) - 2)
                            ELSE 0 END AS dup_bp
                FROM toks k LEFT JOIN dist di ON di.doc_id = k.doc_id
            )
            SELECT doc_id,
                   n_tok::BIGINT AS n_tokens,
                   sw_hits::BIGINT AS stopword_hits,
                   dup_bp::BIGINT AS dup_3gram_bp,
                   (CASE WHEN n_tok >= 5 AND n_tok <= 100000
                              AND (10000 * sw_hits) // greatest(n_tok, 1) >= 100
                              AND dup_bp <= 2000
                         THEN 1 ELSE 0 END)::BIGINT AS passes
            FROM base
        """,
        "token_counts": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '\S+'))::BIGINT
                       AS n_ws_tokens,
                   len(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+'))::BIGINT
                       AS n_bpe_tokens
            FROM documents
        """,
        # the composed hygiene pipeline: quality gate + language gate +
        # decontamination + exact keep-first, each tier copied verbatim
        # from its standalone oracle above/below
        "clean_corpus": f"WITH {DUP_PLANTED_SQL}," + r"""
            toks AS (
                SELECT doc_id, text, regexp_extract_all(text, '\S+') AS t
                FROM documents
            ),
            idx AS (
                SELECT doc_id, t,
                       unnest(range(1, greatest(len(t) - 1, 1))) AS i
                FROM toks
            ),
            g3 AS (
                SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
                FROM idx
            ),
            dist AS (SELECT doc_id, count(DISTINCT g) AS d3 FROM g3 GROUP BY 1),
            base AS (
                SELECT k.doc_id,
                       len(k.t) AS n_tok,
                       len(regexp_extract_all(k.text, '\b(the|a|an|of|to|and|in|is|it|that|for|on|with|as|at|by|be|this|are|or)\b'))
                           AS sw_hits,
                       CASE WHEN len(k.t) >= 3
                            THEN (10000 * (len(k.t) - 2 - coalesce(di.d3, 0)))
                                 // (len(k.t) - 2)
                            ELSE 0 END AS dup_bp
                FROM toks k LEFT JOIN dist di ON di.doc_id = k.doc_id
            ),
            q AS (
                SELECT doc_id FROM base
                WHERE n_tok >= 5 AND n_tok <= 100000
                  AND (10000 * sw_hits) // greatest(n_tok, 1) >= 100
                  AND dup_bp <= 2000
            ),
            sc AS (
                SELECT doc_id,
                    len(regexp_extract_all(text, '\b(the|a|of|to|and|in|is)\b')) AS score_en,
                    len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht)\b')) AS score_de,
                    len(regexp_extract_all(text, '\b(le|la|les|et|est|une)\b')) AS score_fr
                FROM documents
            ),
            lng AS (
                SELECT doc_id FROM sc
                WHERE NOT (score_fr > greatest(score_en, score_de))
                  AND NOT (score_de > score_en)
            ),
            test AS (
                SELECT sha256(text) AS dg,
                       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                           AS fp
                FROM documents WHERE doc_id % 10 = 0
                UNION ALL
                SELECT sha256(upper(text) || '  ') AS dg,
                       md5(trim(regexp_replace(lower(upper(text) || '  '),
                                               '\s+', ' ', 'g'))) AS fp
                FROM documents WHERE doc_id % 7 = 0
            ),
            surv AS (
                SELECT d.path, d.text FROM d
                WHERE d.doc_id IN (SELECT doc_id FROM q)
                  AND d.doc_id IN (SELECT doc_id FROM lng)
                  AND NOT EXISTS (SELECT 1 FROM test t
                                  WHERE t.dg = sha256(d.text))
                  AND NOT EXISTS (
                      SELECT 1 FROM test t
                      WHERE t.fp = md5(trim(regexp_replace(lower(d.text),
                                                           '\s+', ' ', 'g')))
                  )
            )
            SELECT sha256(text) AS digest, min(path) AS path
            FROM surv GROUP BY 1
        """,
        "decontaminate": r"""
            WITH test AS (
                SELECT sha256(text) AS dg,
                       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                           AS fp
                FROM documents WHERE doc_id % 10 = 0
                UNION ALL
                SELECT sha256(upper(text) || '  ') AS dg,
                       md5(trim(regexp_replace(lower(upper(text) || '  '),
                                               '\s+', ' ', 'g'))) AS fp
                FROM documents WHERE doc_id % 7 = 0
            )
            SELECT d.doc_id,
                   CASE WHEN EXISTS (SELECT 1 FROM test t
                                     WHERE t.dg = sha256(d.text))
                        THEN 'exact' ELSE 'fingerprint' END AS reason
            FROM documents d
            WHERE EXISTS (SELECT 1 FROM test t WHERE t.dg = sha256(d.text))
               OR EXISTS (
                   SELECT 1 FROM test t
                   WHERE t.fp = md5(trim(regexp_replace(lower(d.text),
                                                        '\s+', ' ', 'g')))
               )
        """,
        # containment over the clone-planted corpus: q*shared >= p*min
        "containment_pairs": f"""
            WITH {CLONE_PLANTED_SQL.strip().rstrip()},
            toks AS (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS t
                FROM cp
            ),
            idx AS (
                SELECT doc_id, t,
                       unnest(range(1, greatest(len(t) - 3, 1))) AS i
                FROM toks
            ),
            grams AS (
                SELECT DISTINCT doc_id,
                       t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                            || t[i+3] || ' ' || t[i+4] AS g
                FROM idx
            ),
            totals AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*)::BIGINT AS shared
                FROM grams a JOIN grams b USING (g)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT p.id_a, p.id_b, p.shared,
                   ta.n::BIGINT AS n_a, tb.n::BIGINT AS n_b
            FROM pairs p
            JOIN totals ta ON ta.doc_id = p.id_a
            JOIN totals tb ON tb.doc_id = p.id_b
            WHERE 5 * p.shared >= 4 * least(ta.n, tb.n)
        """,
        "ngram_jaccard": r"""
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                FROM documents
            ),
            idx AS (
                SELECT doc_id, t,
                       unnest(range(1, greatest(len(t) - 3, 1))) AS i
                FROM toks
            ),
            grams AS (
                SELECT DISTINCT doc_id,
                       t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                            || t[i+3] || ' ' || t[i+4] AS g
                FROM idx
            ),
            totals AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*)::BIGINT AS shared
                FROM grams a JOIN grams b USING (g)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT p.id_a, p.id_b, p.shared,
                   ta.n::BIGINT AS n_a, tb.n::BIGINT AS n_b
            FROM pairs p
            JOIN totals ta ON ta.doc_id = p.id_a
            JOIN totals tb ON tb.doc_id = p.id_b
            WHERE 2 * p.shared >= 1 * (ta.n + tb.n - p.shared)
        """,
        "knn_topk": """
            SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(
                           a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
                           b.vec_id
                   )::BIGINT AS rnk
            FROM embeddings a, embeddings b
            WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id
            QUALIFY rnk <= 5
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(
                      a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
        """,
        # PII counts on the original text; redaction applied sequentially
        # email -> ip -> ssn — DuckDB regexp_* is RE2, same engine as
        # pyarrow.compute, so the comparison is hash-exact by construction
        "pii_scrub": r"""
            WITH """ + PII_PLANTED_SQL.strip() + r"""
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}'
                   ))::BIGINT AS n_emails,
                   len(regexp_extract_all(text,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'
                   ))::BIGINT AS n_ipv4,
                   len(regexp_extract_all(text,
                       '\b\d{3}-\d{2}-\d{4}\b'
                   ))::BIGINT AS n_ssn,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(text,
                         '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                       '<IP>', 'g'),
                     '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'
                   ) AS clean_text
            FROM pp
        """,
        # within-doc line stats over the line-planted corpus
        "line_dup_stats": """
            WITH """ + LINE_PLANTED_SQL.strip() + """,
            split AS (
                SELECT doc_id, string_split(text, chr(10)) AS lines FROM lp
                WHERE text IS NOT NULL  -- engine drops null-text docs too
            )
            SELECT doc_id,
                   len(lines)::BIGINT AS n_lines,
                   len(list_distinct(lines))::BIGINT AS n_distinct_lines,
                   ((10000 * (len(lines) - len(list_distinct(lines))))
                       // len(lines))::BIGINT AS dup_line_bp
            FROM split
        """,
        # cross-corpus boilerplate removal: df = distinct docs per line,
        # common iff df*100 >= 5 * n_docs; survivors rejoined in order
        "boilerplate_clean": """
            WITH """ + LINE_PLANTED_SQL.strip() + """,
            ln AS (
                SELECT doc_id,
                       unnest(string_split(text, chr(10))) AS line,
                       unnest(range(len(string_split(text, chr(10))))) AS ord
                FROM lp
            ),
            df AS (
                SELECT line, count(DISTINCT doc_id) AS df FROM ln GROUP BY 1
            ),
            common AS (
                SELECT line FROM df
                WHERE df * 100 >= 5 * (SELECT count(*) FROM lp)
            )
            SELECT l.doc_id,
                   count(*)::BIGINT AS n_lines,
                   (count(*) FILTER (c.line IS NOT NULL))::BIGINT
                       AS n_removed,
                   coalesce(
                     string_agg(l.line, chr(10) ORDER BY l.ord)
                       FILTER (c.line IS NULL),
                     ''
                   ) AS clean_text
            FROM ln l LEFT JOIN common c ON c.line = l.line
            GROUP BY l.doc_id
        """,
        # top-500 tokens, deterministic (cnt DESC, token ASC) tie-break
        "vocab_topk": r"""
            WITH toks AS (
                SELECT unnest(list_filter(
                    string_split_regex(text, '[ \t\n\f\r]+'),
                    t -> t <> ''
                )) AS token
                FROM documents
            )
            SELECT token, count(*)::BIGINT AS cnt
            FROM toks GROUP BY token
            ORDER BY cnt DESC, token
            LIMIT 500
        """,
        # as-of join: clicks to the latest same-user purchase at/before the
        # click; right side pre-deduped on (user, ts) by max event_id —
        # identical to the engine's tie-break
        "events_asof_join": """
            WITH clicks AS (
                SELECT event_id, ts, user_id FROM events
                WHERE event_type = 'click'
            ),
            purch AS (
                SELECT event_id AS purchase_event_id, ts, user_id,
                       CAST(round(value * 100) AS BIGINT) AS purchase_cents
                FROM events WHERE event_type = 'purchase'
                QUALIFY row_number() OVER (
                    PARTITION BY user_id, ts ORDER BY event_id DESC
                ) = 1
            )
            SELECT c.event_id, c.user_id, c.ts,
                   p.purchase_event_id, p.purchase_cents,
                   (epoch_us(c.ts) - epoch_us(p.ts))::BIGINT AS lag_us
            FROM clicks c
            ASOF LEFT JOIN purch p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        # deterministic Bernoulli sample: md5-hex prefix order == numeric
        # order, threshold = floor(0.2 * 2^32) = 0x33333333
        "hash_sample": """
            SELECT * FROM documents
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '33333333'
        """,
        # per-source cap: k=10 by (md5(id), id) order
        "cap_per_source": """
            SELECT doc_id, source,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS BIGINT) AS rnk
            FROM documents
            QUALIFY rnk <= 10
        """,
        # deterministic domain mixing: scale = min_g (c_g*10000)//w_g,
        # k_g = (scale*w_g)//10000, picks by (md5(id), id) per group
        "mix_to_weights": """
            WITH w(source, wbp) AS (
                VALUES ('src0', 5000), ('src1', 3000), ('src2', 2000)
            ),
            cnt AS (
                SELECT source, count(*)::BIGINT AS c
                FROM documents GROUP BY 1
            ),
            sc AS (
                SELECT min(c * 10000 // wbp)::BIGINT AS scale
                FROM cnt JOIN w USING (source)
            ),
            k AS (
                SELECT w.source, (sc.scale * w.wbp // 10000)::BIGINT AS k_g
                FROM w, sc
            )
            SELECT d.doc_id, d.source,
                   CAST(row_number() OVER (
                       PARTITION BY d.source
                       ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
                   ) AS BIGINT) AS rnk
            FROM documents d JOIN k USING (source)
            QUALIFY rnk <= k.k_g
        """,
        # per-doc top-5 terms by tf/df (one double division both sides —
        # bit-identical ordering), ties (tf DESC, token ASC)
        "tfidf_top_terms": r"""
            WITH toks AS (
                SELECT doc_id, unnest(list_filter(
                    string_split_regex(text, '[ \t\n\f\r]+'),
                    t -> t <> ''
                )) AS token
                FROM documents WHERE text IS NOT NULL
            ),
            tf AS (
                SELECT doc_id, token, count(*)::BIGINT AS tf
                FROM toks GROUP BY 1, 2
            ),
            df AS (
                SELECT token, count(DISTINCT doc_id)::BIGINT AS df
                FROM toks GROUP BY 1
            )
            SELECT doc_id, token, tf, df,
                   CAST(row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY tf * 1.0 / df DESC, tf DESC, token
                   ) AS BIGINT) AS rnk
            FROM tf JOIN df USING (token)
            QUALIFY rnk <= 5
        """,
        # interval join: events × 30-min incident windows per user,
        # lo <= ts < hi containment (many-to-many)
        "events_interval_join": """
            WITH inc AS (
                SELECT event_id AS incident_id, user_id, ts AS lo,
                       ts + INTERVAL 30 MINUTE AS hi
                FROM events WHERE event_type = 'error'
            )
            SELECT e.event_id, e.user_id, e.ts, e.event_type,
                   i.incident_id,
                   (epoch_us(e.ts) - epoch_us(i.lo))::BIGINT AS lag_us
            FROM events e
            JOIN inc i
              ON e.user_id = i.user_id AND e.ts >= i.lo AND e.ts < i.hi
        """,
        # normalized (canonical-text) dedup over the case-variant
        # scenario: lower → strip non-[a-z0-9 ws] runs to ' ' → collapse
        # ws → trim — the literal RE2 mirror of normdedup.canonical_text
        "normalized_dedup": f"""
            WITH {CASE_VARIANTS_SQL.strip().rstrip()},
            canon AS (
                SELECT doc_id,
                       md5(trim(regexp_replace(regexp_replace(
                               lower(text),
                               '[^a-z0-9 \t\n\f\r]+', ' ', 'g'),
                               '[ \t\n\f\r]+', ' ', 'g'), ' ')) AS digest
                FROM cv WHERE text IS NOT NULL
            )
            SELECT digest, count(*)::BIGINT AS cnt,
                   min(doc_id)::BIGINT AS rep
            FROM canon GROUP BY digest HAVING count(*) >= 2
        """,
        # Q1-style: integer cents (round() half-away both sides), percent
        # points; sums exact int64, avgs one double division
        "tpch_pricing_summary": """
            WITH c AS (
                SELECT l_returnflag, l_linestatus,
                       CAST(l_quantity AS BIGINT) AS q,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
                       CAST(round(l_discount * 100) AS BIGINT) AS d,
                       CAST(round(l_tax * 100) AS BIGINT) AS tx
                FROM lineitem
                WHERE l_shipdate <= TIMESTAMP '2000-01-01'
            )
            SELECT l_returnflag, l_linestatus,
                   sum(q)::BIGINT AS sum_qty,
                   sum(p)::BIGINT AS sum_base,
                   sum(p * (100 - d))::BIGINT AS sum_disc,
                   sum(p * (100 - d) * (100 + tx))::BIGINT AS sum_charge,
                   count(*)::BIGINT AS cnt,
                   sum(q)::DOUBLE / count(*) AS avg_qty,
                   sum(p)::DOUBLE / count(*) AS avg_price
            FROM c GROUP BY 1, 2
        """,
        # Q3-style: revenue in cent·pct int64; ties broken by orderkey
        "tpch_top_orders": """
            SELECT l.l_orderkey AS o_orderkey,
                   sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                   )::BIGINT AS revenue
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderdate < TIMESTAMP '1998-01-01'
              AND l.l_shipdate >= TIMESTAMP '1998-01-01'
            GROUP BY 1
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        # supplier → nation → region dimension chain
        "suppliers_per_region": """
            SELECT r.r_name, count(*)::BIGINT AS n_suppliers
            FROM supplier s
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            GROUP BY 1
        """,
        # Q14-style promo share; two int sums, one double division
        "tpch_promo_share": """
            WITH r AS (
                SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                           AS rev,
                       (p.p_type = 'PROMO')::BIGINT AS is_promo
                FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l.l_shipdate < TIMESTAMP '1998-01-01'
            )
            SELECT sum(rev * is_promo)::BIGINT AS promo_rev,
                   sum(rev)::BIGINT AS total_rev,
                   100.0 * sum(rev * is_promo)::BIGINT
                       / sum(rev)::BIGINT AS promo_share_pct
            FROM r
        """,
        # 3 most recent events per user: ROW_NUMBER() over total order
        "events_recent_topk": """
            SELECT user_id, event_id, rn FROM (
                SELECT user_id, event_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events
            ) WHERE rn <= 3
        """,
        # RANK() per event type by int64 cents DESC, rank <= 5
        "events_value_rank": """
            SELECT event_type, event_id, cents, rnk FROM (
                SELECT event_type, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       RANK() OVER (
                           PARTITION BY event_type
                           ORDER BY CAST(round(value * 100) AS BIGINT) DESC
                       ) AS rnk
                FROM events
            ) WHERE rnk <= 5
        """,
        # LAG(cents) per user in (ts, event_id) order + delta
        "events_lag_delta": """
            SELECT event_id, user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   LAG(CAST(round(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_cents,
                   CAST(round(value * 100) AS BIGINT)
                       - LAG(CAST(round(value * 100) AS BIGINT)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS delta_cents
            FROM events
        """,
        # Q7-style nation-pair shipping volume, 1996-1997, integer cents
        "tpch_nation_pair_volume": """
            SELECT sn.n_name AS supp_nation,
                   cn.n_name AS cust_nation,
                   sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                   )::BIGINT AS revenue,
                   count(*)::BIGINT AS n_items
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation sn ON sn.n_nationkey = s.s_nationkey
            JOIN nation cn ON cn.n_nationkey = c.c_nationkey
            WHERE sn.n_name <> cn.n_name
              AND l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2
        """,
        # exact COUNT(DISTINCT user) per event type
        "users_per_event_type": """
            SELECT event_type,
                   count(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY 1
        """,
        # per-user running sum of int cents in (ts, event_id) order
        "events_running_total": """
            SELECT event_id, user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   sum(CAST(round(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   )::BIGINT AS running_cents
            FROM events
        """,
        # Q4-style EXISTS: ≥1 item shipped >90 days after order date
        "tpch_late_orders": """
            SELECT o.o_orderpriority,
                   count(*)::BIGINT AS n_late_orders
            FROM orders o
            WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
            )
            GROUP BY 1
        """,
        # top-10 per source by (n_chars DESC, doc_id) — ranked selection
        "top_quality_per_source": """
            SELECT doc_id, source, n_chars,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id
                   ) AS BIGINT) AS rnk
            FROM documents
            QUALIFY rnk <= 10
        """,
        # group-size histogram over planted dups; n_files = cnt*n_groups
        "dup_size_histogram": f"""
            WITH {DUP_PLANTED_SQL},
            per AS (
                SELECT sha256(text) AS dg, count(*)::BIGINT AS cnt
                FROM d WHERE text IS NOT NULL GROUP BY 1
            )
            SELECT cnt, count(*)::BIGINT AS n_groups,
                   (cnt * count(*))::BIGINT AS n_files
            FROM per GROUP BY cnt
        """,
        # 64-token windows; DuckDB list slice is 1-based inclusive
        "chunk_documents": r"""
            WITH toks AS (
                SELECT doc_id,
                       regexp_extract_all(text, '[^ \t\n\f\r]+') AS t
                FROM documents WHERE text IS NOT NULL
            ),
            c AS (
                SELECT doc_id, t,
                       unnest(range(0, (len(t) + 63) // 64)) AS ci
                FROM toks WHERE len(t) > 0
            )
            SELECT doc_id, ci::BIGINT AS chunk_idx,
                   array_to_string(
                       t[ci * 64 + 1 : least((ci + 1) * 64, len(t))],
                       ' ') AS chunk_text,
                   (least((ci + 1) * 64, len(t)) - ci * 64)::BIGINT
                       AS n_tok
            FROM c
        """,
        # Q5-style 4-table join; revenue in cent·pct int64
        "tpch_revenue_by_nation": """
            SELECT n.n_name,
                   sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                   )::BIGINT AS revenue,
                   count(*)::BIGINT AS n_items
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1
        """,
        # per-doc gram novelty: owner = min(doc_id) per distinct gram
        "ngram_novelty": r"""
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                FROM documents
            ),
            idx AS (
                SELECT doc_id, t,
                       unnest(range(1, greatest(len(t) - 3, 1))) AS i
                FROM toks
            ),
            grams AS (
                SELECT DISTINCT doc_id,
                       t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                            || t[i+3] || ' ' || t[i+4] AS g
                FROM idx
            ),
            own AS (SELECT g, min(doc_id) AS owner FROM grams GROUP BY 1),
            nov AS (
                SELECT owner AS doc_id, count(*)::BIGINT AS n_novel
                FROM own GROUP BY 1
            ),
            tot AS (
                SELECT doc_id, count(*)::BIGINT AS n_grams
                FROM grams GROUP BY 1
            )
            SELECT t.doc_id, t.n_grams,
                   coalesce(n.n_novel, 0)::BIGINT AS n_novel,
                   coalesce(n.n_novel, 0)::DOUBLE / t.n_grams AS novelty
            FROM tot t LEFT JOIN nov n USING (doc_id)
        """,
        # per-language quantile_disc — same ceil-rank rule as the engine
        "lang_length_quantiles": r"""
            WITH lens AS (
                SELECT lang,
                       len(regexp_extract_all(
                           text, '[^ \t\n\f\r]+'))::BIGINT AS n
                FROM documents WHERE text IS NOT NULL
            )
            SELECT lang, quantile_disc(n, 0.25)::BIGINT AS p25,
                   quantile_disc(n, 0.50)::BIGINT AS p50,
                   quantile_disc(n, 0.75)::BIGINT AS p75,
                   count(*)::BIGINT AS n_docs
            FROM lens GROUP BY lang
        """,
        # GROUPING SETS at all four levels; NULL marks aggregated dims
        "rollup_stats": """
            SELECT lang, source, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS sum_n_chars
            FROM documents
            GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
        """,
        # one row per column: nulls + min/max; VARCHAR cast == str() for
        # the int/string columns documents has; binary string collation
        "profile_documents": """
            SELECT 'doc_id' AS column, count(*)::BIGINT AS n_rows,
                   (count(*) - count(doc_id))::BIGINT AS n_null,
                   CAST(min(doc_id) AS VARCHAR) AS min_v,
                   CAST(max(doc_id) AS VARCHAR) AS max_v
            FROM documents
            UNION ALL
            SELECT 'lang', count(*)::BIGINT,
                   (count(*) - count(lang))::BIGINT,
                   min(lang), max(lang) FROM documents
            UNION ALL
            SELECT 'n_chars', count(*)::BIGINT,
                   (count(*) - count(n_chars))::BIGINT,
                   CAST(min(n_chars) AS VARCHAR),
                   CAST(max(n_chars) AS VARCHAR) FROM documents
            UNION ALL
            SELECT 'source', count(*)::BIGINT,
                   (count(*) - count(source))::BIGINT,
                   min(source), max(source) FROM documents
            UNION ALL
            SELECT 'text', count(*)::BIGINT,
                   (count(*) - count(text))::BIGINT,
                   min(text), max(text) FROM documents
        """,
        # 3×MAD robust outliers per type; integer cents, quantile_disc
        # medians — same ceil-rank rule as the engine's histogram scan
        "events_outliers": """
            WITH c AS (
                SELECT event_id, event_type,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events
            ),
            m AS (
                SELECT event_type,
                       quantile_disc(cents, 0.5)::BIGINT AS med
                FROM c GROUP BY 1
            ),
            mad AS (
                SELECT c.event_type,
                       quantile_disc(abs(c.cents - m.med), 0.5)::BIGINT
                           AS mad
                FROM c JOIN m USING (event_type) GROUP BY 1
            )
            SELECT c.event_id, c.event_type, c.cents
            FROM c JOIN m USING (event_type) JOIN mad USING (event_type)
            WHERE abs(c.cents - m.med) > 3 * mad.mad
        """,
        # debounce dedup: keep an event iff no prior same-(user, type)
        # instance within 2h — the lag() rule, ties by (ts, event_id)
        "events_debounce": """
            SELECT event_id, ts, user_id, event_type FROM (
                SELECT event_id, ts, user_id, event_type,
                       lag(ts) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id
                       ) AS pts
                FROM events
            )
            WHERE pts IS NULL OR ts - pts >= INTERVAL 2 HOUR
        """,
        # per-doc corpus-frequency token stats; mean_freq is ONE double
        # division of the same int64 sums both sides
        "rare_token_stats": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(
                           text, '[^ \t\n\f\r]+')) AS tok
                FROM documents WHERE text IS NOT NULL
            ),
            freq AS (
                SELECT tok, count(*)::BIGINT AS f FROM toks GROUP BY 1
            )
            SELECT doc_id, count(*)::BIGINT AS n_tok,
                   coalesce(sum(CASE WHEN f <= 2 THEN 1 END), 0)::BIGINT
                       AS n_rare,
                   min(f)::BIGINT AS min_freq,
                   sum(f)::DOUBLE / count(*) AS mean_freq
            FROM toks JOIN freq USING (tok)
            GROUP BY doc_id
        """,
        # adaptive [p10, p99] token-length filter; quantile_disc matches
        # the engine's ceil-rank rule over the distinct-length histogram
        "length_quantile_filter": r"""
            WITH nt AS (
                SELECT doc_id,
                       len(regexp_extract_all(
                           text, '[^ \t\n\f\r]+'))::BIGINT AS n_tok
                FROM documents WHERE text IS NOT NULL
            ),
            b AS (
                SELECT quantile_disc(n_tok, 0.10)::BIGINT AS lo,
                       quantile_disc(n_tok, 0.99)::BIGINT AS hi
                FROM nt
            )
            SELECT doc_id, n_tok
            FROM nt, b WHERE n_tok >= lo AND n_tok <= hi
        """,
        # per-doc top-3 by 5-gram Jaccard; rank key is ONE double
        # division of the same int64s both sides, ties → other_id ASC
        "similar_docs_topk": r"""
            WITH toks AS (
                SELECT doc_id, regexp_extract_all(text, '\S+') AS t
                FROM documents
            ),
            idx AS (
                SELECT doc_id, t,
                       unnest(range(1, greatest(len(t) - 3, 1))) AS i
                FROM toks
            ),
            grams AS (
                SELECT DISTINCT doc_id,
                       t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                            || t[i+3] || ' ' || t[i+4] AS g
                FROM idx
            ),
            totals AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*)::BIGINT AS shared
                FROM grams a JOIN grams b USING (g)
                WHERE a.doc_id < b.doc_id
                GROUP BY 1, 2
            ),
            pj AS (
                SELECT p.id_a, p.id_b, p.shared,
                       ta.n::BIGINT AS n_a, tb.n::BIGINT AS n_b
                FROM pairs p
                JOIN totals ta ON ta.doc_id = p.id_a
                JOIN totals tb ON tb.doc_id = p.id_b
            ),
            sym AS (
                SELECT id_a AS doc_id, id_b AS other_id, shared,
                       n_a AS n_self, n_b AS n_other FROM pj
                UNION ALL
                SELECT id_b, id_a, shared, n_b, n_a FROM pj
            )
            SELECT doc_id, other_id, shared, n_self, n_other,
                   row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY shared::DOUBLE
                                / (n_self + n_other - shared) DESC,
                                other_id
                   )::BIGINT AS rnk
            FROM sym QUALIFY rnk <= 3
        """,
        # 90/5/5 split by md5(id) 8-hex prefix; thresholds are
        # hex((cum_bp * 2^32) // 10000) — e6666666 / f3333333
        "hash_split": """
            SELECT *,
                   CASE
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                          < 'e6666666' THEN 'train'
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                          < 'f3333333' THEN 'val'
                     ELSE 'test'
                   END AS split
            FROM documents
        """,
        # keep-best normalized dedup: int64-packed argmax key
        # len*2^40 + (2^40-1 - id); max() picks longest member, tie →
        # smallest id — the literal mirror of normdedup._ID_MASK packing
        "normalized_keep_best": f"""
            WITH {CASE_VARIANTS_SQL.strip().rstrip()},
            canon AS (
                SELECT doc_id,
                       least(length(text), 8388607)::BIGINT AS len,
                       md5(trim(regexp_replace(regexp_replace(
                               lower(text),
                               '[^a-z0-9 \t\n\f\r]+', ' ', 'g'),
                               '[ \t\n\f\r]+', ' ', 'g'), ' ')) AS digest
                FROM cv WHERE text IS NOT NULL
            ),
            pk AS (
                SELECT digest,
                       len * 1099511627776
                         + (1099511627775 - doc_id) AS key
                FROM canon
            )
            SELECT digest, count(*)::BIGINT AS cnt,
                   (1099511627775 - (max(key) % 1099511627776))::BIGINT
                       AS keep_id,
                   (max(key) // 1099511627776)::BIGINT AS keep_len
            FROM pk GROUP BY digest
        """,
        # BPE merge step: top-200 adjacent token pairs, (cnt DESC, pair)
        "bpe_pair_counts": r"""
            WITH toks AS (
                SELECT list_filter(
                    string_split_regex(text, '[ \t\n\f\r]+'),
                    t -> t <> ''
                ) AS tk
                FROM documents WHERE text IS NOT NULL
            ),
            pairs AS (
                SELECT tk[g.i] || ' ' || tk[g.i + 1] AS pair
                FROM toks,
                     LATERAL (
                       SELECT unnest(generate_series(1, len(tk) - 1)) AS i
                     ) g
            )
            SELECT pair, count(*)::BIGINT AS cnt
            FROM pairs GROUP BY pair
            ORDER BY cnt DESC, pair
            LIMIT 200
        """,
        # fuzzy (5-gram containment) decontamination vs the token-deleted
        # eval scenario: 2*shared >= n_eval, train-side gram df capped at
        # 256 on both sides (never binds at these scales; mirrored anyway)
        "fuzzy_decontaminate": f"""
            WITH {FUZZY_EVAL_SQL.strip().rstrip()},
            ttk AS (
                SELECT doc_id, regexp_extract_all(text, '\\S+') AS tk
                FROM documents WHERE text IS NOT NULL
            ),
            tg AS (
                SELECT DISTINCT t.doc_id,
                       md5(array_to_string(t.tk[g.i+1 : g.i+5], ' ')) AS h
                FROM ttk t,
                     LATERAL (
                       SELECT unnest(generate_series(0, len(t.tk)-5)) AS i
                     ) g
            ),
            etk AS (
                SELECT eval_id, regexp_extract_all(text, '\\S+') AS tk
                FROM fe WHERE text IS NOT NULL
            ),
            eg AS (
                SELECT DISTINCT e.eval_id,
                       md5(array_to_string(e.tk[g.i+1 : g.i+5], ' ')) AS h
                FROM etk e,
                     LATERAL (
                       SELECT unnest(generate_series(0, len(e.tk)-5)) AS i
                     ) g
            ),
            dfc AS (SELECT h, count(*) AS c FROM tg GROUP BY h),
            tgk AS (
                SELECT tg.doc_id, tg.h FROM tg
                JOIN dfc USING (h) WHERE dfc.c <= 256
            ),
            et AS (SELECT eval_id, count(*) AS n FROM eg GROUP BY 1),
            pr AS (
                SELECT tgk.doc_id, eg.eval_id, count(*) AS shared
                FROM tgk JOIN eg USING (h)
                GROUP BY 1, 2
            )
            SELECT pr.doc_id, pr.eval_id, pr.shared::BIGINT AS shared,
                   et.n::BIGINT AS n_eval
            FROM pr JOIN et USING (eval_id)
            WHERE 2 * pr.shared >= et.n
        """,
        # exact discrete token-length quantiles (quantile_disc semantics)
        "doc_length_quantiles": r"""
            WITH lens AS (
                SELECT len(regexp_extract_all(text, '[^ \t\n\f\r]+')) AS n
                FROM documents WHERE text IS NOT NULL
            )
            SELECT quantile_disc(n, 0.10)::BIGINT AS p10,
                   quantile_disc(n, 0.25)::BIGINT AS p25,
                   quantile_disc(n, 0.50)::BIGINT AS p50,
                   quantile_disc(n, 0.75)::BIGINT AS p75,
                   quantile_disc(n, 0.90)::BIGINT AS p90,
                   quantile_disc(n, 0.99)::BIGINT AS p99,
                   count(*)::BIGINT AS n_docs
            FROM lens
        """,
    }
