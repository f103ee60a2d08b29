"""Round-3 regression tests — the ADVICE_r2 fixes.

Covers: hash_exchange out-of-range partition loudness, run_partitioned
partition-name parsing + n_partitions validation, RE2-exact whitespace
(\\v exclusion), verify_mixed null-stored-row skip-and-count.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# hash_exchange: rows with part outside [0, num_parts) must raise, not drop
# ---------------------------------------------------------------------------


def test_hash_exchange_out_of_range_part_raises(ray_session):
    import ray.data
    from ray.exceptions import RayTaskError

    from quichash_ray.stages.exchange import hash_exchange

    ds = ray.data.from_arrow(
        pa.table({"x": pa.array([1, 2, 3]), "part": pa.array([0, 1, 7])})
    )
    with pytest.raises((RayTaskError, ValueError), match="outside"):
        hash_exchange(ds, "part", lambda t: t, num_parts=4).materialize()

    neg = ray.data.from_arrow(
        pa.table({"x": pa.array([1]), "part": pa.array([-1])})
    )
    with pytest.raises((RayTaskError, ValueError), match="outside"):
        hash_exchange(neg, "part", lambda t: t, num_parts=4).materialize()


# ---------------------------------------------------------------------------
# run_partitioned: wide part names clean up; n_partitions mismatch recomputes
# ---------------------------------------------------------------------------


def _write_parts(cp, name, num_parts, mult=1):
    import ray.data

    def part_fn(i):
        return ray.data.from_arrow(
            pa.table({"v": pa.array([i * mult], pa.int64())})
        )

    return cp.run_partitioned(name, part_fn, num_parts)


def test_run_partitioned_cleans_wide_stale_parts(tmp_path, ray_session):
    import os

    from quichash_ray.state.checkpoint import CheckpointedPipeline

    cp = CheckpointedPipeline(str(tmp_path))
    final = cp._stage_dir("s")
    # simulate a stale partition from a >99999-part attempt: the old
    # int(entry[5:10]) parse read "part-123456" as 12345 and could keep it
    os.makedirs(os.path.join(final, "part-123456"))
    with open(os.path.join(final, "part-123456", "x.parquet"), "wb") as f:
        pa.parquet.write_table(pa.table({"v": pa.array([999], pa.int64())}), f)
    with open(os.path.join(final, "part-123456.done"), "w") as f:
        f.write("stale")
    out = _write_parts(cp, "s", 3)
    vals = sorted(r["v"] for r in out.take_all())
    assert vals == [0, 1, 2]  # stale 999 row did not join the output
    assert not os.path.exists(os.path.join(final, "part-123456"))


def test_run_partitioned_num_parts_mismatch_recomputes(tmp_path, ray_session):
    from quichash_ray.state.checkpoint import CheckpointedPipeline

    cp = CheckpointedPipeline(str(tmp_path))
    _write_parts(cp, "s", 4, mult=1)
    assert cp.lineage("s")["n_partitions"] == 4
    # re-running with a different partition count must NOT serve the stale
    # 4-part output — part_fn(i) semantics changed with num_parts
    out = _write_parts(cp, "s", 2, mult=10)
    vals = sorted(r["v"] for r in out.take_all())
    assert vals == [0, 10]
    assert cp.lineage("s")["n_partitions"] == 2
    # same count short-circuits to load (values stay from the committed run)
    out2 = _write_parts(cp, "s", 2, mult=777)
    assert sorted(r["v"] for r in out2.take_all()) == [0, 10]


# ---------------------------------------------------------------------------
# RE2-exact whitespace: \v is NOT whitespace to RE2 (DuckDB oracle engine)
# ---------------------------------------------------------------------------


def test_normalize_for_fingerprint_keeps_vertical_tab():
    from quichash_ray.functions.text import normalize_for_fingerprint

    # RE2 \s = [ \t\n\f\r]; a\x0bb must survive normalization unchanged so
    # fingerprints match the DuckDB oracle byte-for-byte
    assert normalize_for_fingerprint("a\x0bb") == "a\x0bb"
    assert normalize_for_fingerprint("A  b\t\nc ") == "a b c"


def test_gopher_tokens_consistent_with_re2(ray_session):
    import ray.data

    from quichash_ray.pipelines.textstats import gopher_quality

    # "a\x0bb c" is 2 RE2 tokens ("a\x0bb", "c"); the 3-gram tokenizer must
    # agree with n_tokens (RE2 \S+) on \v input
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(["a\x0bb c"], pa.string()),
            }
        )
    )
    row = gopher_quality(ds).take_all()[0]
    assert row["n_tokens"] == 2


# ---------------------------------------------------------------------------
# verify_mixed: null digest/algorithm stored rows → counted 'skipped'
# ---------------------------------------------------------------------------


def test_verify_mixed_null_stored_rows_skipped(ray_session):
    import ray.data

    from quichash_ray.pipelines.dbops import verify_mixed, verify_report
    from quichash_ray.state.metrics import read_metrics, reset_metrics

    reset_metrics()
    stored = ray.data.from_arrow(
        pa.table(
            {
                "path": pa.array(["ok", "nulldig", "nullalgo"]),
                "digest": pa.array(
                    [hashlib.sha256(b"x").hexdigest(), None,
                     hashlib.sha256(b"z").hexdigest()]
                ),
                "algorithm": pa.array(["sha256", "sha256", None]),
                "fast_mode": pa.array([False, False, False]),
            }
        )
    )
    current = ray.data.from_arrow(
        pa.table(
            {
                "path": pa.array(["ok", "nulldig", "nullalgo", "fresh"]),
                "text": pa.array(["x", "y", "z", "w"]),
            }
        )
    )
    out = verify_mixed(stored, current).to_pandas().set_index("path")
    assert out.loc["ok", "status"] == "match"
    assert out.loc["nulldig", "status"] == "skipped"
    assert out.loc["nullalgo", "status"] == "skipped"
    assert out.loc["fresh", "status"] == "new"
    rep = verify_report(verify_mixed(stored, current))
    assert rep["skipped"] == 2
    assert read_metrics().get("verify_mixed_skipped_null", 0) >= 2


# ---------------------------------------------------------------------------
# ANN exact-verify is candidate-bounded (VERDICT_r2 #1): vectors entering the
# verify stage are exactly the candidate ids, never the corpus, and results
# are exact
# ---------------------------------------------------------------------------


def test_exact_verify_pairs_candidate_bounded(ray_session):
    import ray.data

    from quichash_ray.pipelines import similarity as sim
    from quichash_ray.state.metrics import read_metrics, reset_metrics

    rng = np.random.Generator(np.random.Philox(key=[7, 0]))
    n, d = 500, 8
    mat = rng.standard_normal((n, d))
    data = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), pa.float64()), d
                ),
            }
        )
    ).materialize()
    cand = [(0, 1), (2, 3), (4, 5), (10, 250), (333, 444)]
    pairs = ray.data.from_arrow(
        pa.table(
            {
                "vec_id_a": pa.array([a for a, _ in cand], pa.int64()),
                "vec_id_b": pa.array([b for _, b in cand], pa.int64()),
            }
        )
    )
    reset_metrics()
    thr = 0.0
    out = sim._exact_verify_pairs(data, pairs, thr, "vec_id", "embedding")
    got = sorted(
        (r["vec_id_a"], r["vec_id_b"]) for r in out.take_all()
    )
    # brute-force expectation
    unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    want = sorted(
        (a, b) for a, b in cand if float(unit[a] @ unit[b]) >= thr
    )
    assert got == want
    # boundedness: exactly the 10 candidate ids were encoded/shuffled,
    # not the 500-row corpus
    assert read_metrics().get("ann_verify_vec_rows", 0) == 10


# ---------------------------------------------------------------------------
# hash_exchange auto-regime: above the object-count budget it transparently
# takes the sort-groupby path, same results, no caller flag
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("regime_budget", [None, "120"])
@pytest.mark.parametrize("num_parts", [2, 7, 40])
def test_exchange_regime_grid(ray_session, monkeypatch, regime_budget, num_parts):
    """Randomized grid over partition counts × regimes (flat vs forced
    two-level), list-of-datasets input, P larger than distinct keys:
    per-partition sums must match a pandas groupby reference exactly."""
    import ray.data

    from quichash_ray.stages.exchange import hash_exchange

    if regime_budget is not None:
        monkeypatch.setenv("QUICHASH_EXCHANGE_MAX_OBJECTS", regime_budget)
    rng = np.random.default_rng(31 + num_parts)
    n = 1_500
    part = rng.integers(0, min(num_parts, 5), n)  # fewer keys than P
    v = rng.integers(-100, 100, n)
    t = pa.table(
        {
            "part": pa.array(part, pa.int64()),
            "v": pa.array(v, pa.int64()),
        }
    )
    # two datasets as a list input, uneven block sizes
    ds_a = ray.data.from_arrow(
        [t.slice(0, 400), t.slice(400, 100)]
    ).materialize()
    ds_b = ray.data.from_arrow(
        [t.slice(500, 50), t.slice(550, 150), t.slice(700, 250),
         t.slice(950, 550)]
    ).materialize()

    def agg(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"p": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
            )
        p = np.asarray(g["part"], np.int64)
        vv = np.asarray(g["v"], np.int64)
        assert np.unique(p % 1000).size <= len(set(p))  # sanity
        out_p, out_s = [], []
        for key in np.unique(p):
            out_p.append(int(key))
            out_s.append(int(vv[p == key].sum()))
        return pa.table(
            {"p": pa.array(out_p, pa.int64()), "s": pa.array(out_s, pa.int64())}
        )

    got = (
        hash_exchange([ds_a, ds_b], "part", agg, num_parts, drop_part=False)
        .to_pandas()
        .sort_values("p")
        .reset_index(drop=True)
    )
    import pandas as pd

    want = (
        pd.DataFrame({"p": part, "v": v})
        .groupby("p", as_index=False)["v"]
        .sum()
        .rename(columns={"v": "s"})
        .sort_values("p")
        .reset_index(drop=True)
    )
    assert got[["p", "s"]].to_dict("records") == want.to_dict("records")


def test_two_level_exchange_skew_and_empty_parts(ray_session, monkeypatch):
    """Forced split2 regime with every row in ONE final partition: the
    level-2 task must still apply fn once per final partition (empty
    slices included), keep per-partition exactness, and respect
    drop_part=False."""
    import ray.data

    from quichash_ray.stages import exchange
    from quichash_ray.stages.exchange import hash_exchange

    n, P = 2_000, 17
    t = pa.table(
        {
            "part": pa.array(np.full(n, 5), pa.int64()),  # all rows → part 5
            "v": pa.array(np.arange(n), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(
        [t.slice(i * 100, 100) for i in range(20)]
    ).materialize()

    def per_part(g: pa.Table) -> pa.Table:
        # one row per fn call, even when the partition is empty —
        # makes the call-per-final-partition contract observable
        has_part = "part" in g.column_names
        return pa.table(
            {
                "n": pa.array([g.num_rows], pa.int64()),
                "kept_part": pa.array([int(has_part)], pa.int64()),
            }
        )

    monkeypatch.setenv("QUICHASH_EXCHANGE_MAX_OBJECTS", "200")
    out = hash_exchange(ds, "part", per_part, P).to_pandas()
    assert exchange._LAST_REGIME == "split2"
    assert len(out) == P  # fn ran once per final partition
    assert out["n"].sum() == n
    assert sorted(out["n"])[-1] == n  # the skewed partition holds all rows
    assert (out["kept_part"] == 0).all()  # drop_part=True default

    out2 = hash_exchange(
        ds, "part", per_part, P, drop_part=False
    ).to_pandas()
    assert exchange._LAST_REGIME == "split2"
    assert (out2["kept_part"] == 1).all()
    assert out2["n"].sum() == n


def test_hash_exchange_auto_sort_regime(ray_session, monkeypatch):
    import ray.data

    from quichash_ray.stages import exchange
    from quichash_ray.stages.exchange import hash_exchange

    rng = np.random.default_rng(11)
    n = 5_000
    t = pa.table(
        {
            "part": pa.array(rng.integers(0, 13, n), pa.int64()),
            "v": pa.array(rng.integers(0, 1000, n), pa.int64()),
        }
    )
    # 25 input blocks x 13 parts = 325 expected objects
    ds = ray.data.from_arrow(
        [t.slice(i * 200, 200) for i in range(25)]
    ).materialize()

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

    split = hash_exchange(ds, "part", agg, 13).to_pandas()
    assert exchange._LAST_REGIME == "split"
    # budget below 25 blocks x 13 parts: auto-switches to the TWO-LEVEL
    # split/merge (S super-partitions), no caller flag
    monkeypatch.setenv("QUICHASH_EXCHANGE_MAX_OBJECTS", "300")
    auto2 = hash_exchange(ds, "part", agg, 13).to_pandas()
    assert exchange._LAST_REGIME == "split2"
    # budget so tight even S would be tiny: streaming sort-groupby regime
    monkeypatch.setenv("QUICHASH_EXCHANGE_MAX_OBJECTS", "60")
    auto_sort = hash_exchange(ds, "part", agg, 13).to_pandas()
    assert exchange._LAST_REGIME == "sort"
    a = sorted(map(tuple, split[["s", "c"]].to_numpy().tolist()))
    for other in (auto2, auto_sort):
        b = sorted(map(tuple, other[["s", "c"]].to_numpy().tolist()))
        assert a == b
    assert sum(c for _, c in a) == n
    # 13 partition outputs in every regime
    assert len(a) == 13


# ---------------------------------------------------------------------------
# decontaminate join fallback ≡ broadcast path (VERDICT_r2 #3)
# ---------------------------------------------------------------------------


def test_decontaminate_join_fallback_equivalence(ray_session):
    import ray.data

    from quichash_ray.pipelines.decontam import decontaminate

    test_texts = ["alpha beta gamma", "Hello   World", "unique eval doc"]
    train_texts = [
        "alpha beta gamma",      # exact match
        "hello world",           # fingerprint match (case/ws normalized)
        "HELLO\tWORLD",          # fingerprint match
        "no relation here",      # clean
        None,                    # null → clean, never crashes
        "alpha beta gamma",      # second exact match, distinct id
    ]
    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(train_texts)), pa.int64()),
                "text": pa.array(train_texts, pa.string()),
                "extra": pa.array(
                    [f"m{i}" for i in range(len(train_texts))], pa.string()
                ),
            }
        )
    )
    test = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(100, 100 + len(test_texts)), pa.int64()),
                "text": pa.array(test_texts, pa.string()),
            }
        )
    )

    def rows(ds, cols):
        return sorted(tuple(r[c] for c in cols) for r in ds.take_all())

    # removed: broadcast vs join
    b_rm = rows(decontaminate(train, test), ["doc_id", "reason"])
    j_rm = rows(
        decontaminate(train, test, broadcast_limit=0), ["doc_id", "reason"]
    )
    assert b_rm == j_rm
    assert b_rm == [
        (0, "exact"), (1, "fingerprint"), (2, "fingerprint"), (5, "exact")
    ]

    # clean: broadcast vs join (all columns survive)
    b_cl = rows(decontaminate(train, test, emit="clean"), ["doc_id", "extra"])
    j_cl = rows(
        decontaminate(train, test, broadcast_limit=0, emit="clean"),
        ["doc_id", "extra"],
    )
    assert b_cl == j_cl
    assert [i for i, _ in b_cl] == [3, 4]


# ---------------------------------------------------------------------------
# verify_mixed broadcast tier ≡ join tier (VERDICT_r2 #8)
# ---------------------------------------------------------------------------


def test_verify_mixed_broadcast_equals_join(ray_session):
    import ray.data

    from quichash_ray.functions.fastmode import fast_sample
    from quichash_ray.pipelines.dbops import verify_mixed

    texts = {"a": "x" * 300, "b": "hello world", "c": "y" * 300, "d": "gone"}
    S = 64
    stored = ray.data.from_arrow(
        pa.table(
            {
                "path": pa.array(["a", "b", "c", "d", "nul"]),
                "digest": pa.array(
                    [
                        hashlib.md5(fast_sample(texts["a"].encode(), S)).hexdigest(),
                        hashlib.sha256(texts["b"].encode()).hexdigest(),
                        hashlib.sha256(
                            fast_sample(texts["c"].encode(), S)
                        ).hexdigest(),
                        hashlib.sha256(texts["d"].encode()).hexdigest(),
                        None,
                    ]
                ),
                "algorithm": pa.array(
                    ["md5", "sha256", "sha256", "sha256", "sha256"]
                ),
                "fast_mode": pa.array([True, False, True, False, False]),
            }
        )
    )
    current = ray.data.from_arrow(
        pa.table(
            {
                "path": pa.array(["a", "b", "c", "e", "nul"]),
                "text": pa.array(
                    [texts["a"], texts["b"], texts["c"] + "!", "newfile", "zz"]
                ),
            }
        )
    )

    def rows(ds):
        return sorted(
            (r["path"], r["status"], r["expected"], r["actual"])
            for r in ds.take_all()
        )

    bcast = rows(verify_mixed(stored, current, fast_sample_size=S))
    joined = rows(
        verify_mixed(stored, current, fast_sample_size=S, broadcast_limit=0)
    )
    assert bcast == joined
    by_path = {p: s for p, s, _, _ in bcast}
    assert by_path == {
        "a": "match", "b": "match", "c": "mismatch",
        "d": "missing", "e": "new", "nul": "skipped",
    }


# ---------------------------------------------------------------------------
# multimodal codec tier: optional-dep wiring + magic-byte routing
# ---------------------------------------------------------------------------


def test_codec_image_routing_and_fallback():
    from quichash_ray.stages import multimodal as mm

    # raw payload of exactly w*h*3 bytes never mis-routes, even if the
    # random bytes start with a (short) codec magic like BM
    raw = b"BM" + bytes(2 * 2 * 3 - 2)
    img = mm._decode_image(raw, 2, 2)
    assert img.shape == (2, 2, 3)

    # compressed magic with a non-raw length routes to the codec tier;
    # PNG decodes with or without PIL (pure-stdlib fallback) — a garbage
    # body raises (PIL error / ValueError), never NotImplementedError
    png_like = b"\x89PNG\r\n\x1a\n" + bytes(100)
    with pytest.raises((ValueError, Exception)):  # not a real PNG body
        mm._decode_image(png_like, 2, 2)
    # JPEG is genuinely codec-bound: routes to PIL or raises loudly
    jpg_like = b"\xff\xd8\xff" + bytes(100)
    if not mm._HAS_PIL:
        with pytest.raises(NotImplementedError, match="PIL"):
            mm._decode_image(jpg_like, 2, 2)


def test_codec_audio_routing_and_fallback():
    from quichash_ray.stages import multimodal as mm

    # raw PCM decodes everywhere
    wave = mm._decode_audio(bytes(64))
    assert wave.dtype == np.float32 and len(wave) == 32
    # 'RIFF' without the WAVE fourcc is NOT routed to the codec tier
    riffish = b"RIFF" + bytes(60)
    assert len(mm._decode_audio(riffish)) == 32
    # WAV decodes with or without soundfile (pure-stdlib fallback) — a
    # truncated body raises (soundfile error / ValueError), never
    # NotImplementedError
    wav_hdr = b"RIFF" + bytes(4) + b"WAVE" + bytes(52)
    with pytest.raises((ValueError, Exception)):  # truncated WAV body
        mm._decode_audio(wav_hdr)
    # OGG is genuinely codec-bound
    if not mm._HAS_SOUNDFILE:
        with pytest.raises(NotImplementedError, match="soundfile"):
            mm._decode_audio(b"OggS" + bytes(60))


@pytest.mark.skipif(
    not __import__("importlib").util.find_spec("PIL"),
    reason="PIL not installed in this container — codec tier covered by "
    "routing tests; this test exercises the real decode when present",
)
def test_codec_image_real_decode(ray_session):
    import io

    from PIL import Image

    from quichash_ray.stages import multimodal as mm

    img = Image.new("RGB", (4, 4), (255, 0, 0))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    arr = mm._decode_image(buf.getvalue(), 4, 4)
    assert arr.shape == (4, 4, 3)
    assert (arr[:, :, 0] == 255).all() and (arr[:, :, 1] == 0).all()


def test_repo_neardup_forks_and_df_cap(ray_session):
    """Fork pairs found with exact integer Jaccard; a boilerplate digest
    shared by every repo is df-capped out (metered, not silently)."""
    import ray.data

    from quichash_ray.pipelines.repodedup import repo_neardup
    from quichash_ray.state.metrics import read_metrics, reset_metrics

    reset_metrics()
    # 4 repos x 6 unique files each; repo b = fork of a sharing 4 of 6;
    # every repo also carries the same LICENSE boilerplate
    rows = []
    for r, files in {
        "a": [f"ta{i}" for i in range(6)],
        "b": [f"ta{i}" for i in range(4)] + ["tb4", "tb5"],
        "c": [f"tc{i}" for i in range(6)],
        "d": [f"td{i}" for i in range(6)],
    }.items():
        rows += [{"repo": r, "content": t} for t in files]
        rows.append({"repo": r, "content": "LICENSE-BOILERPLATE"})
    ds = ray.data.from_items(rows)
    out = repo_neardup(
        ds, threshold_bp=4000, max_repos_per_digest=3
    ).to_pandas()
    # boilerplate (df=4 > cap 3) is excluded from inter AND sizes:
    # jacc(a,b) = 4 / (6+6-4) = 0.5 exactly
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["repo_a"], row["repo_b"]) == ("a", "b")
    assert row["inter"] == 4 and row["union_cnt"] == 8
    assert row["jacc_bp"] == 5000
    assert row["cont_bp"] == 10000 * 4 // 6
    m = read_metrics()
    assert m.get("repo_neardup_dropped_digests", 0) >= 1


def test_repo_neardup_no_pairs_below_threshold(ray_session):
    import ray.data

    from quichash_ray.pipelines.repodedup import repo_neardup

    ds = ray.data.from_items(
        [{"repo": "x", "content": "one"}, {"repo": "y", "content": "two"}]
    )
    out = repo_neardup(ds)
    # Ray's to_pandas() drops columns on zero-row datasets; assert on the
    # Dataset schema (kept stable by the typed empty union block)
    assert sorted(out.schema().names) == [
        "cont_bp", "inter", "jacc_bp", "repo_a", "repo_b", "union_cnt",
    ]
    assert len(out.to_pandas()) == 0


def test_grouped_dup_stats_per_lang(ray_session):
    """Hand-computed per-lang analyze rows; same digest under two langs
    counts once per lang; per-row invariant holds."""
    import ray.data

    from quichash_ray.pipelines.dedup import digest_table, grouped_dup_stats

    rows = (
        # py: "aa" x3 (dup group), "b" x1 -> files 4, uniq 2
        [{"lang": "py", "path": f"p{i}", "content": "aa"} for i in range(3)]
        + [{"lang": "py", "path": "p3", "content": "b"}]
        # rs: "aa" x2 (same digest as py's, counted independently), "c" x1
        + [{"lang": "rs", "path": f"r{i}", "content": "aa"} for i in range(2)]
        + [{"lang": "rs", "path": "r2", "content": "c"}]
    )
    digests = digest_table(
        ray.data.from_items(rows), key_cols=("lang", "path")
    )
    out = (
        grouped_dup_stats(digests, group_col="lang")
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    assert list(out.index) == ["py", "rs"]
    py, rs = out.loc["py"], out.loc["rs"]
    assert (py["total_files"], py["unique_hashes"]) == (4, 2)
    assert (py["dup_groups"], py["dup_files"], py["wasted_bytes"]) == (1, 3, 4)
    assert py["total_bytes"] == 3 * 2 + 1
    assert (rs["total_files"], rs["unique_hashes"]) == (3, 2)
    assert (rs["dup_groups"], rs["dup_files"], rs["wasted_bytes"]) == (1, 2, 2)
    # analyze invariant per slice
    for _, r in out.iterrows():
        assert r["unique_hashes"] == (
            r["total_files"] - r["dup_files"] + r["dup_groups"]
        )


def test_latest_snapshot_tiers_equivalent_and_ties(ray_session):
    """Broadcast and join tiers produce identical snapshots; ties at the
    max version all survive."""
    import ray.data

    from quichash_ray.pipelines.repodedup import latest_snapshot

    rows = [
        {"repo": "a", "path": "x", "commit": "1", "content": "old"},
        {"repo": "a", "path": "x", "commit": "2", "content": "new"},
        {"repo": "a", "path": "y", "commit": "1", "content": "only"},
        # tie: two rows at the max version
        {"repo": "b", "path": "z", "commit": "3", "content": "t1"},
        {"repo": "b", "path": "z", "commit": "3", "content": "t2"},
        {"repo": "b", "path": "z", "commit": "2", "content": "stale"},
    ]
    ds = ray.data.from_items(rows)

    def snap(limit):
        return (
            latest_snapshot(ds, broadcast_limit=limit)
            .to_pandas()
            .sort_values(["repo", "path", "content"])
            .reset_index(drop=True)[["repo", "path", "commit", "content"]]
        )

    bcast = snap(10**6)   # broadcast tier
    joined = snap(0)      # force the join tier
    import pandas.testing as pt

    pt.assert_frame_equal(bcast, joined)
    assert bcast["content"].tolist() == ["new", "only", "t1", "t2"]
