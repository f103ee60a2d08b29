"""Round-4 fixes: size-derived join fallbacks + default-fill equivalence,
cached_get byte budget, vectorized fingerprint normalization, linededup
null-text contract, driver-pinned partition hashing."""

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# attach_lookup: forced-join tier must fill `default` exactly like the
# broadcast tier (pre-round-4 the join tier left nulls — tier inequivalence)
# ---------------------------------------------------------------------------


def test_attach_lookup_join_tier_fills_default(ray_session):
    import ray.data

    from quichash_ray.stages.lookup import attach_lookup

    rng = np.random.default_rng(11)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(rng.integers(0, 40, 300), pa.int64())})
    )
    mapping = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(np.arange(0, 40, 3), pa.int64()),
                "v": pa.array(np.arange(0, 40, 3) * 7, pa.int64()),
            }
        )
    )
    kw = dict(key_col="k", value_col="v", default=-5)
    bc = (
        attach_lookup(ds, mapping, **kw)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    jn = (
        attach_lookup(ds, mapping, broadcast_limit=0, **kw)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert (bc["v"] == -5).any()  # misses exist and are filled
    assert bc.equals(jn)


def test_semi_join_tiers_equivalent_with_duplicate_keys(ray_session):
    import ray.data

    from quichash_ray.stages.lookup import semi_join_broadcast

    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(100), pa.int64()),
                "payload": pa.array(np.arange(100) * 2, pa.int64()),
            }
        )
    )
    # duplicate keys: the join tier must NOT multiply matching rows
    keys = ray.data.from_arrow(
        pa.table({"id": pa.array([3, 3, 3, 7, 7, 50, 99], pa.int64())})
    )
    bc = (
        semi_join_broadcast(ds, keys, "id")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    jn = (
        semi_join_broadcast(ds, keys, "id", broadcast_limit=0)
        .to_pandas()[["id", "payload"]]
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(bc["id"]) == [3, 7, 50, 99]
    assert bc.equals(jn)


def test_join_num_parts_scales_with_mapping():
    from quichash_ray.stages.lookup import _join_num_parts

    assert _join_num_parts(1000, None) == 8  # MIN_PARTS floor
    assert _join_num_parts(1000, 3) == 3  # explicit override wins
    big = _join_num_parts(2_000_000_000, None)
    assert big > 8  # a 2B-row mapping no longer lands on 8 aggregators
    assert _join_num_parts(8_000_000_000, None) > big


# ---------------------------------------------------------------------------
# cached_get byte budget: older entries evicted past the cap, newest kept
# ---------------------------------------------------------------------------


def test_cached_get_byte_budget(ray_session, monkeypatch):
    import ray

    from quichash_ray.stages import broadcast as bc

    monkeypatch.setattr(bc, "_MAX_BYTES", 1 << 20)  # 1 MiB budget
    bc._CACHE.clear()
    bc._cache_bytes = 0
    refs = [ray.put(np.zeros(100_000, np.uint8)) for _ in range(30)]
    for r in refs:
        bc.cached_get(r)
    stats = bc.cache_stats()
    assert stats["bytes"] <= (1 << 20) + 100_000  # newest always kept
    assert stats["entries"] < 30
    # newest entry survives (the value the current query reads per batch)
    assert refs[-1].hex() in bc._CACHE
    # an oversized single value is cached alone, not refused
    big = ray.put(np.zeros(4 << 20, np.uint8))
    val = bc.cached_get(big)
    assert val.nbytes == 4 << 20
    assert big.hex() in bc._CACHE
    assert bc.cache_stats()["entries"] >= 1
    bc._CACHE.clear()
    bc._cache_bytes = 0


# ---------------------------------------------------------------------------
# vectorized fingerprint normalization ≡ the scalar reference
# ---------------------------------------------------------------------------


def test_normalize_fp_array_matches_scalar():
    from quichash_ray.functions.text import (
        normalize_for_fingerprint,
        normalize_fp_array,
    )

    cases = [
        "Hello   World",
        "  \t mixed\nWS\f\rhere  ",
        "UPPER lower MiXeD",
        "",
        " ",
        "one",
        "tabs\t\t\tbetween",
        "Ünïcödé  ÇASE",
        None,
    ]
    out = normalize_fp_array(pa.array(cases, pa.string())).to_pylist()
    for s, o in zip(cases, out):
        if s is None:
            assert o is None
        else:
            assert o == normalize_for_fingerprint(s), repr(s)


def test_batch_key_digests_match_scalar():
    from quichash_ray.pipelines.decontam import _batch_key_digests, _doc_keys

    texts = ["Some  Document", None, "another ONE\nwith lines", ""]
    tbl = pa.table({"text": pa.array(texts, pa.large_string())})
    sha, fp = _batch_key_digests(tbl, "text")
    for t, s, f in zip(texts, sha, fp):
        if t is None:
            assert s is None and f is None
        else:
            es, ef = _doc_keys(t)
            assert s.hex() == es and f.hex() == ef


# ---------------------------------------------------------------------------
# linededup null-text contract: null docs are SKIPPED (oracle parity)
# ---------------------------------------------------------------------------


def test_linededup_skips_null_text(ray_session):
    import ray.data

    from quichash_ray.pipelines.linededup import (
        boilerplate_removal,
        line_stats,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["a\nb\na", None, "common\nx", "common\ny"],
                pa.large_string(),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    stats = line_stats(ds).to_pandas().sort_values("doc_id")
    assert list(stats["doc_id"]) == [1, 3, 4]  # doc 2 absent, not zeros
    assert stats.loc[stats["doc_id"] == 1, "n_lines"].iloc[0] == 3
    assert stats.loc[stats["doc_id"] == 1, "n_distinct_lines"].iloc[0] == 2

    clean = (
        boilerplate_removal(ds, n_docs=4, pct=50)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(clean["doc_id"]) == [1, 3, 4]
    # 'common' appears in 2 of 4 docs = 50% → removed
    assert clean.loc[clean["doc_id"] == 3, "clean_text"].iloc[0] == "x"


def test_line_planted_scenario_contains_nulls(ray_session):
    """The derived scenario must actually exercise the null contract."""
    import ray.data

    from quichash_ray.pipelines.derived import line_planted

    ids = np.arange(200, dtype=np.int64)
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids),
                "text": pa.array(
                    [f"doc body {i}" for i in ids], pa.large_string()
                ),
            }
        )
    )
    out = line_planted(docs).to_pandas()
    nulls = out[out["text"].isna()]["doc_id"].to_numpy()
    assert len(nulls) > 0
    assert all(i % 97 == 13 for i in nulls)


# ---------------------------------------------------------------------------
# string-hash impl pinned at stage build (driver) time
# ---------------------------------------------------------------------------


def test_key_part_column_impl_pinned():
    from quichash_ray.stages.partitioning import (
        key_part_column,
        string_hash_impl,
    )

    col = pa.array(["alpha", "beta", "gamma", None, "alpha"], pa.string())
    impl = string_hash_impl()
    a = key_part_column(col, 16, impl=impl).to_pylist()
    b = key_part_column(col, 16, impl=impl).to_pylist()
    assert a == b
    assert a[0] == a[4]  # same key, same partition
    assert a[3] == 0  # nulls to part 0
    # crc32 fallback is deterministic and respects the same contract
    c = key_part_column(col, 16, impl="crc32").to_pylist()
    d = key_part_column(col, 16, impl="crc32").to_pylist()
    assert c == d and c[0] == c[4] and c[3] == 0
