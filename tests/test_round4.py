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


# ---------------------------------------------------------------------------
# pure-stdlib PNG/BMP/WAV fallback decoders (codec-absent container)
# ---------------------------------------------------------------------------


def _encode_png(img, color_type=2, filters=None):
    """Minimal test-side PNG encoder (zlib + chosen per-row filter types)."""
    import struct
    import zlib

    h, w = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    px = img.reshape(h, w * ch).astype(np.int32)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for y, ft in enumerate(filters):
        line = px[y]
        if ft == 0:
            enc = line
        elif ft == 2:
            enc = (line - prev) & 0xFF
        elif ft == 1:
            enc = line.copy()
            enc[ch:] = (line[ch:] - line[:-ch]) & 0xFF
        elif ft == 3:
            enc = line.copy()
            for i in range(w * ch):
                left = line[i - ch] if i >= ch else 0
                enc[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            enc = line.copy()
            for i in range(w * ch):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (
                    b if pb <= pc else c
                )
                enc[i] = (line[i] - pred) & 0xFF
        raw.append(ft)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_pure_roundtrip_all_filters():
    from quichash_ray.stages.multimodal import _decode_image

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    for filters in ([0] * 6, [1] * 6, [2] * 6, [3] * 6, [4] * 6,
                    [0, 1, 2, 3, 4, 2]):
        payload = _encode_png(img, filters=list(filters))
        out = _decode_image(payload, 5, 6)
        assert np.array_equal(out, img), filters


def test_png_pure_gray_and_rgba():
    from quichash_ray.stages.multimodal import _decode_image

    rng = np.random.default_rng(8)
    gray = rng.integers(0, 256, (4, 4, 1), dtype=np.uint8)
    out = _decode_image(_encode_png(gray, color_type=0), 4, 4)
    assert np.array_equal(out, np.repeat(gray, 3, axis=2))
    rgba = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
    out = _decode_image(_encode_png(rgba, color_type=6), 4, 4)
    assert np.array_equal(out, rgba[:, :, :3])


def test_bmp_pure_roundtrip():
    import struct

    from quichash_ray.stages.multimodal import _decode_image

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (3, 3, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # RGB→BGR
        rows.extend(row + b"\x00" * (stride - len(row)))
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                      2835, 2835, 0, 0)
    )
    out = _decode_image(header + bytes(rows), w, h)
    assert np.array_equal(out, img)


def test_wav_pure_roundtrip():
    import io
    import wave as wavmod

    from quichash_ray.stages.multimodal import _decode_audio

    rng = np.random.default_rng(10)
    pcm = rng.integers(-32768, 32767, 200, dtype=np.int16)
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(pcm.tobytes())
    out = _decode_audio(buf.getvalue())
    assert np.allclose(out, pcm.astype(np.float32) / 32768.0)
    # stereo mixes to mono
    stereo = np.stack([pcm, -pcm], axis=1).ravel()
    buf2 = io.BytesIO()
    with wavmod.open(buf2, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(stereo.tobytes())
    out2 = _decode_audio(buf2.getvalue())
    assert len(out2) == len(pcm)
    assert np.allclose(out2, 0.0, atol=1 / 32768.0)  # L+R cancel


def test_wav_pure_float32_and_8bit():
    import struct

    from quichash_ray.stages.multimodal import _decode_audio

    samples = np.linspace(-1, 1, 64).astype(np.float32)

    def wav(tag, bits, data):
        fmt = struct.pack("<HHIIHH", tag, 1, 16000,
                          16000 * bits // 8, bits // 8, bits)
        body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    out = _decode_audio(wav(3, 32, samples.tobytes()))
    assert np.allclose(out, samples)
    u8 = ((samples * 127) + 128).astype(np.uint8)
    out8 = _decode_audio(wav(1, 8, u8.tobytes()))
    assert np.allclose(out8, (u8.astype(np.float32) - 128) / 128)


# ---------------------------------------------------------------------------
# hash_exchange GIANT regime: num_parts >= QUICHASH_EXCHANGE_STREAM_PARTS
# must route to the streaming sort-groupby path (no materialization) and
# produce identical per-partition results to the flat split/merge path
# ---------------------------------------------------------------------------


def test_exchange_giant_regime_streams_and_matches(ray_session, monkeypatch):
    import ray.data

    from quichash_ray.stages import exchange as ex

    rng = np.random.default_rng(47)
    P = 16
    n = 2_000
    part = rng.integers(0, P, n)
    v = rng.integers(-1000, 1000, n)
    t = pa.table(
        {
            "part": pa.array(part, pa.int64()),
            "v": pa.array(v, pa.int64()),
        }
    )

    def agg(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"p": pa.array([], pa.int64()), "s": pa.array([], pa.int64())}
            )
        p = np.asarray(g["part"], np.int64)
        vv = np.asarray(g["v"], np.int64)
        keys = np.unique(p)
        return pa.table(
            {
                "p": pa.array(keys, pa.int64()),
                "s": pa.array(
                    [int(vv[p == k].sum()) for k in keys], pa.int64()
                ),
            }
        )

    def run():
        ds = ray.data.from_arrow([t.slice(0, 700), t.slice(700, 1300)])
        return (
            ex.hash_exchange(ds, "part", agg, P, drop_part=False)
            .to_pandas()
            .sort_values("p")
            .reset_index(drop=True)
        )

    flat = run()
    assert ex._LAST_REGIME in ("split", "split2")
    # P >= stream threshold -> auto-routes to the streaming sort path
    monkeypatch.setenv("QUICHASH_EXCHANGE_STREAM_PARTS", str(P))
    giant = run()
    assert ex._LAST_REGIME == "sort"
    assert flat.equals(giant)
    assert (flat["s"].to_numpy().sum()) == int(v.sum())


# ---------------------------------------------------------------------------
# normalized (canonical-text) dedup: case/punct/ws variants collapse; byte
# distinctions that survive canonicalization do not
# ---------------------------------------------------------------------------


def test_canonical_text_kernel():
    from quichash_ray.pipelines.normdedup import canonical_text

    arr = pa.array(
        [
            "Hello,   World!",
            " hello world ",
            "HELLO\t\nWORLD??",
            "hello worlds",  # different after canon
            None,
        ]
    )
    got = canonical_text(arr).to_pylist()
    assert got == [
        "hello world",
        "hello world",
        "hello world",
        "hello worlds",
        None,
    ]


def test_normalized_dup_groups(ray_session):
    import ray.data

    from quichash_ray.pipelines.normdedup import normalized_dup_groups

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
            "text": [
                "The cat;  sat.",
                " the CAT sat !!!",
                "the cat sat",
                "an unrelated doc",
                None,  # null text: no row, no group membership
                "the cat sat on",  # survives canon as distinct
            ],
        }
    )
    out = (
        normalized_dup_groups(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("rep")
        .reset_index(drop=True)
    )
    assert len(out) == 1
    assert out.loc[0, "cnt"] == 3 and out.loc[0, "rep"] == 0


def test_case_variants_scenario(ray_session):
    import ray.data

    from quichash_ray.pipelines.derived import case_variants

    t = pa.table(
        {
            "doc_id": pa.array([0, 5, 6, 7], pa.int64()),
            "text": ["Zero doc.", "five", "Six doc!", "seven"],
        }
    )
    out = case_variants(ray.data.from_arrow(t)).to_pandas()
    # 4 originals + 2 variants (doc_id 0 and 6)
    assert len(out) == 6
    v = out[out.doc_id >= 10_000_000].sort_values("doc_id")
    assert list(v.text) == [" ZERO DOC. !!!", " SIX DOC! !!!"]


# ---------------------------------------------------------------------------
# BPE pair counts: list-boundary and empty-token handling; combiner totals
# ---------------------------------------------------------------------------


def test_bpe_pair_counts(ray_session):
    import ray.data

    from quichash_ray.pipelines.textstats import bpe_pair_counts

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": [
                "a b a b",      # (a b)x2, (b a)x1
                " a b ",        # boundary empties dropped: (a b)x1
                "c",            # no pairs
                None,           # null list: no pairs, no boundary poison
                "b a",          # (b a)x1
            ],
        }
    )
    out = bpe_pair_counts(ray.data.from_arrow(t), k=10).to_pandas()
    got = dict(zip(out["pair"], out["cnt"]))
    assert got == {"a b": 3, "b a": 2}
    # deterministic order: cnt DESC, pair ASC
    assert list(out["pair"]) == ["a b", "b a"]


def test_bpe_pair_counts_cross_doc_pairs_not_counted(ray_session):
    import ray.data

    from quichash_ray.pipelines.textstats import bpe_pair_counts

    # doc ends with 'x', next begins with 'y' — 'x y' must NOT appear
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": ["q x", "y q"],
        }
    )
    out = bpe_pair_counts(ray.data.from_arrow(t), k=10).to_pandas()
    assert set(out["pair"]) == {"q x", "y q"}


def test_doc_length_quantiles_matches_duckdb_rule(ray_session):
    import duckdb
    import ray.data

    from quichash_ray.pipelines.textstats import doc_length_quantiles

    # 10 docs with token counts 1..10 (+1 null doc, skipped)
    texts = [" ".join(["w"] * n) for n in range(1, 11)] + [None]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": texts,
        }
    )
    got = doc_length_quantiles(ray.data.from_arrow(t)).to_pandas()
    con = duckdb.connect()
    con.register("docs", t.to_pandas())
    want = con.execute(
        r"""
        WITH lens AS (
          SELECT len(regexp_extract_all(text, '[^ \t\n\f\r]+')) AS n
          FROM docs WHERE text IS NOT NULL
        )
        SELECT quantile_disc(n, 0.10)::BIGINT AS p10,
               quantile_disc(n, 0.25)::BIGINT AS p25,
               quantile_disc(n, 0.50)::BIGINT AS p50,
               quantile_disc(n, 0.75)::BIGINT AS p75,
               quantile_disc(n, 0.90)::BIGINT AS p90,
               quantile_disc(n, 0.99)::BIGINT AS p99,
               count(*)::BIGINT AS n_docs
        FROM lens
        """
    ).df()
    assert got[sorted(got.columns)].equals(want[sorted(want.columns)])
    assert got.loc[0, "n_docs"] == 10 and got.loc[0, "p50"] == 5


# ---------------------------------------------------------------------------
# fuzzy (shingle-containment) decontamination: cross-corpus pairs only,
# integer-exact threshold, train-df gram cap
# ---------------------------------------------------------------------------


def test_fuzzy_decontaminate_detects_token_dropout(ray_session):
    import ray.data

    from quichash_ray.pipelines.decontam import fuzzy_decontaminate

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike november oscar papa"
    toks = base.split()
    # eval doc: drop every 8th token (~12% dropout) — no 13-gram survives
    # but most 5-grams do
    leaked = " ".join(t for i, t in enumerate(toks, 1) if i % 8 != 0)
    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": [base, "zulu yankee xray whiskey victor uniform tango sierra"],
            }
        )
    )
    test = ray.data.from_arrow(
        pa.table(
            {"eval_id": pa.array([7], pa.int64()), "text": [leaked]}
        )
    )
    out = fuzzy_decontaminate(
        train, test, k=5, threshold_num=1, threshold_den=2
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["doc_id"] == 1 and r["eval_id"] == 7
    assert 2 * r["shared"] >= r["n_eval"] and r["shared"] < r["n_eval"]


def test_fuzzy_decontaminate_gram_cap_drops_boilerplate(ray_session):
    import ray.data

    from quichash_ray.pipelines.decontam import fuzzy_decontaminate

    boiler = "one two three four five"
    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [boiler, boiler, boiler],
            }
        )
    )
    test = ray.data.from_arrow(
        pa.table({"eval_id": pa.array([9], pa.int64()), "text": [boiler]})
    )
    # df=3 > cap=2 → the single gram drops on every side: no pairs at all
    out = fuzzy_decontaminate(train, test, k=5, gram_cap=2).to_pandas()
    assert len(out) == 0
    # with the cap off, all three train docs are fully contained pairs
    out2 = fuzzy_decontaminate(train, test, k=5, gram_cap=None).to_pandas()
    assert len(out2) == 3 and set(out2["doc_id"]) == {1, 2, 3}
    assert (out2["shared"] == 1).all() and (out2["n_eval"] == 1).all()


# ---------------------------------------------------------------------------
# distributed CC hash-min at scale shape: forced hashmin + forced join tier
# on a deep chain graph (diameter 48 → multi-round pointer doubling), must
# equal the numpy reference exactly
# ---------------------------------------------------------------------------


def test_hashmin_forced_join_tier_deep_chain(ray_session, monkeypatch):
    import ray.data

    from quichash_ray.stages import lookup as lookup_mod
    from quichash_ray.stages.unionfind import (
        connected_components,
        numpy_components,
    )

    real = lookup_mod.attach_lookup

    def forced_join(*args, **kwargs):
        kwargs["broadcast_limit"] = 0  # every lookup takes the join tier
        return real(*args, **kwargs)

    monkeypatch.setattr(lookup_mod, "attach_lookup", forced_join)

    # chain 100..148 (diameter 48: >= 4 doubling rounds), a triangle, and
    # a star — mixed component shapes, shuffled edge order
    ea = list(range(100, 148)) + [7, 8, 9] + [500, 500, 500]
    eb = list(range(101, 149)) + [8, 9, 7] + [501, 502, 503]
    rng = np.random.default_rng(3)
    order = rng.permutation(len(ea))
    ea = np.array(ea, np.int64)[order]
    eb = np.array(eb, np.int64)[order]
    edges = ray.data.from_arrow(
        pa.table({"id_a": pa.array(ea), "id_b": pa.array(eb)})
    ).repartition(8)

    got = (
        connected_components(edges, method="hashmin")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    nodes, labels = numpy_components(ea, eb)
    assert list(got["node"]) == list(nodes)
    assert list(got["cluster_id"]) == list(labels)
    # the chain really collapsed to its min id across all 49 nodes
    assert (got.loc[got["node"].between(100, 148), "cluster_id"] == 100).all()


def test_attach_truth_recall_math(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    from quichash_ray.pipelines.fuzzy import attach_truth_recall

    # truth: {1,2,3} one cluster, {4,5} another → required = 3 + 1 = 4
    truth = pa.table(
        {
            "row_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "cluster_id": pa.array([1, 1, 1, 4, 4], pa.int64()),
        }
    )
    pq.write_table(truth, tmp_path / "truth.parquet")
    # prediction splits {1,2,3} into {1,2}+{3} and gets {4,5} right
    # → found = 1 + 1 = 2 → 5000 bp
    pred = ray.data.from_arrow(
        pa.table(
            {
                "row_id": pa.array([1, 2, 3, 4, 5, 99], pa.int64()),
                "cluster_id": pa.array([1, 1, 3, 4, 4, 99], pa.int64()),
                "rep": pa.array([1, 1, 3, 4, 4, 99], pa.int64()),
            }
        )
    )
    out = attach_truth_recall(pred, str(tmp_path / "truth.parquet")).to_pandas()
    assert len(out) == 6
    assert set(out["truth_recall_bp"]) == {5000}


# ---------------------------------------------------------------------------
# interval (range) join: banded sweep vs brute force; string keys; nulls
# ---------------------------------------------------------------------------


def test_interval_join_matches_bruteforce(ray_session):
    import pandas as pd
    import ray.data

    from quichash_ray.stages.intervaljoin import interval_join

    rng = np.random.default_rng(17)
    n_ev, n_iv = 400, 120
    ev = pa.table(
        {
            "k": pa.array(rng.integers(0, 12, n_ev), pa.int64()),
            "ts": pa.array(rng.integers(0, 1000, n_ev), pa.int64()),
            "eid": pa.array(np.arange(n_ev), pa.int64()),
        }
    )
    lo = rng.integers(0, 950, n_iv)
    width = rng.integers(1, 120, n_iv)  # mixed widths incl. overlaps
    iv = pa.table(
        {
            "k": pa.array(rng.integers(0, 12, n_iv), pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(lo + width, pa.int64()),
            "iid": pa.array(np.arange(n_iv), pa.int64()),
        }
    )
    got = (
        interval_join(
            ray.data.from_arrow(ev).repartition(5),
            ray.data.from_arrow(iv).repartition(3),
            by="k", ts_col="ts", lo_col="lo", hi_col="hi",
            left_cols=["eid"], right_cols=["iid"],
        )
        .to_pandas()
        .sort_values(["eid", "iid"])
        .reset_index(drop=True)
    )
    e, i = ev.to_pandas(), iv.to_pandas()
    want = e.merge(i, on="k")
    want = want[(want.ts >= want.lo) & (want.ts < want.hi)]
    want = want[["k", "ts", "eid", "lo", "hi", "iid"]].sort_values(
        ["eid", "iid"]
    ).reset_index(drop=True)
    assert len(got) == len(want) and len(want) > 0
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_interval_join_string_keys_and_nulls(ray_session):
    import ray.data

    from quichash_ray.stages.intervaljoin import interval_join

    ev = pa.table(
        {
            "k": ["a", "a", "b", None, "c"],
            "ts": pa.array([5, 50, 5, 5, None], pa.int64()),
            "eid": pa.array([0, 1, 2, 3, 4], pa.int64()),
        }
    )
    iv = pa.table(
        {
            "k": ["a", "b", "c"],
            "lo": pa.array([0, 0, 0], pa.int64()),
            "hi": pa.array([10, 10, None], pa.int64()),
            "iid": pa.array([100, 101, 102], pa.int64()),
        }
    )
    got = (
        interval_join(
            ray.data.from_arrow(ev), ray.data.from_arrow(iv),
            by="k", ts_col="ts", lo_col="lo", hi_col="hi",
            left_cols=["eid"], right_cols=["iid"],
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    # eid 0 → iid 100 (a, 5 in [0,10)); eid 1 out of range; eid 2 → 101;
    # null ts / null hi rows never join
    assert list(got["eid"]) == [0, 2]
    assert list(got["iid"]) == [100, 101]


def test_tfidf_top_terms_ordering_and_df(ray_session):
    import ray.data

    from quichash_ray.pipelines.textstats import tfidf_top_terms

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": [
                "rare rare common common common",  # rare df=1 beats common df=3
                "common unique",
                "common other",
            ],
        }
    )
    out = tfidf_top_terms(ray.data.from_arrow(t), k_top=2).to_pandas()
    d0 = out[out.doc_id == 0].sort_values("rnk")
    # doc 0: rare (tf=2, df=1, score 2.0) > common (tf=3, df=3, score 1.0)
    assert list(d0["token"]) == ["rare", "common"]
    assert list(d0["tf"]) == [2, 3] and list(d0["df"]) == [1, 3]
    d1 = out[out.doc_id == 1].sort_values("rnk")
    assert list(d1["token"]) == ["unique", "common"]


def test_mix_to_weights_exact_mix(ray_session):
    import ray.data

    from quichash_ray.pipelines.sampling import mix_to_weights

    # 100 a / 10 b / 40 c, target 60/20/20 → limiting group is b:
    # scale = min(100*10000//6000=166, 10*10000//2000=50, 40*10000//2000=200)
    # = 50 → k = 30 / 10 / 10
    n = 150
    src = ["a"] * 100 + ["b"] * 10 + ["c"] * 40
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "source": pa.array(src, pa.string()),
        }
    )
    out = mix_to_weights(
        ray.data.from_arrow(t), {"a": 6000, "b": 2000, "c": 2000}
    ).to_pandas()
    got = out.groupby("source").size().to_dict()
    assert got == {"a": 30, "b": 10, "c": 10}
    # deterministic: same picks on a re-run
    out2 = mix_to_weights(
        ray.data.from_arrow(t), {"a": 6000, "b": 2000, "c": 2000}
    ).to_pandas()
    assert set(out["doc_id"]) == set(out2["doc_id"])


def test_mix_to_weights_unweighted_groups_dropped(ray_session):
    import ray.data

    from quichash_ray.pipelines.sampling import mix_to_weights

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "source": pa.array(["a", "a", "zzz", "zzz"], pa.string()),
        }
    )
    out = mix_to_weights(ray.data.from_arrow(t), {"a": 10000}).to_pandas()
    assert set(out["source"]) == {"a"} and len(out) == 2


def test_normalized_keep_best_longest_wins(ray_session):
    import ray.data

    from quichash_ray.pipelines.normdedup import normalized_keep_best

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 9], pa.int64()),
            "text": pa.array(
                [
                    "Hello,   world",
                    " HELLO WORLD !!!",   # same canonical, longest (16)
                    "hello world",        # same canonical, shortest
                    "solo doc",
                ],
                pa.string(),
            ),
        }
    )
    out = normalized_keep_best(ray.data.from_arrow(t)).to_pandas()
    grp = out[out.cnt == 3].iloc[0]
    assert grp.keep_id == 2 and grp.keep_len == 16
    solo = out[out.cnt == 1].iloc[0]
    assert solo.keep_id == 9 and solo.keep_len == 8


def test_normalized_keep_best_tie_breaks_min_id(ray_session):
    import ray.data

    from quichash_ray.pipelines.normdedup import normalized_keep_best

    t = pa.table(
        {
            "doc_id": pa.array([5, 3], pa.int64()),
            "text": pa.array(["same text.", "same TEXT,"], pa.string()),
        }
    )
    out = normalized_keep_best(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 1 and out.iloc[0].keep_id == 3


def test_hash_split_deterministic_and_complete(ray_session):
    import ray.data

    from quichash_ray.pipelines.sampling import hash_split

    t = pa.table({"doc_id": pa.array(list(range(2000)), pa.int64())})
    splits = [("train", 9000), ("val", 500), ("test", 500)]
    out = hash_split(ray.data.from_arrow(t), splits).to_pandas()
    assert len(out) == 2000  # partition of the input, nothing dropped
    frac = out.groupby("split").size() / 2000
    assert 0.85 < frac["train"] < 0.95
    assert 0.02 < frac["val"] < 0.08 and 0.02 < frac["test"] < 0.08
    out2 = hash_split(ray.data.from_arrow(t), splits).to_pandas()
    assert out.sort_values("doc_id").split.tolist() == out2.sort_values(
        "doc_id"
    ).split.tolist()
    with pytest.raises(ValueError):
        hash_split(ray.data.from_arrow(t), [("a", 5000)])


def test_similar_docs_topk_ranking(ray_session):
    import ray.data

    from quichash_ray.pipelines.ngram import similar_docs_topk

    # doc0 and doc1 share most grams; doc2 overlaps both weakly; doc3 alone
    base = "alpha beta gamma delta epsilon zeta eta theta"
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    base + " one",
                    base + " two",
                    "alpha beta gamma delta epsilon other words here now",
                    "totally different content with no overlap at all xx",
                ],
                pa.string(),
            ),
        }
    )
    out = similar_docs_topk(
        ray.data.from_arrow(t), k_top=2
    ).to_pandas()
    d0 = out[out.doc_id == 0].sort_values("rnk")
    assert list(d0["other_id"]) == [1, 2]  # 1 is nearest, 2 second
    assert 3 not in set(out.doc_id)  # no candidates → no rows
    assert (out.rnk <= 2).all()


def test_length_quantile_filter_bounds(ray_session):
    import ray.data

    from quichash_ray.pipelines.textstats import length_quantile_filter

    texts = [" ".join(["w"] * n) for n in range(1, 101)]  # 1..100 tokens
    t = pa.table(
        {
            "doc_id": pa.array(list(range(100)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = length_quantile_filter(
        ray.data.from_arrow(t), 0.10, 0.90
    ).to_pandas()
    # ceil-rank discrete quantiles over 1..100: p10=10, p90=90
    assert out.n_tok.min() == 10 and out.n_tok.max() == 90
    assert len(out) == 81


def test_rare_token_stats_exact(ray_session):
    import ray.data

    from quichash_ray.pipelines.textstats import rare_token_stats

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "cat cat dog",        # cat f=3 (2 here +1 doc2), dog f=2
                    "cat dog uniqword",   # uniqword f=1 (rare)
                    None,                 # null → absent from output
                ],
                pa.string(),
            ),
        }
    )
    out = (
        rare_token_stats(ray.data.from_arrow(t), rare_max=1)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2]
    d1 = out.loc[1]
    # doc1: instances cat,cat,dog → f = 3,3,2 → n_rare=0, min 2, mean 8/3
    assert d1.n_tok == 3 and d1.n_rare == 0 and d1.min_freq == 2
    assert abs(d1.mean_freq - 8 / 3) < 1e-12
    d2 = out.loc[2]
    # doc2: cat,dog,uniqword → f = 3,2,1 → n_rare=1, min 1, mean 2.0
    assert d2.n_tok == 3 and d2.n_rare == 1 and d2.min_freq == 1
    assert d2.mean_freq == 2.0


def test_events_debounce_lag_rule(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1 click at 0h, +1h (drop), +3h (keep: 2h since previous
        # INSTANCE at +1h even though it was dropped)
        (0, t0, 1, "click"),
        (1, t0 + dt.timedelta(hours=1), 1, "click"),
        (2, t0 + dt.timedelta(hours=3), 1, "click"),
        # different type interleaved: kept independently
        (3, t0 + dt.timedelta(minutes=5), 1, "view"),
        # other user same times: independent
        (4, t0, 2, "click"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([0.0] * 5, pa.float64()),
            "props": pa.array(["{}"] * 5, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = entry.queries()["events_debounce"](str(tmp_path)).to_pandas()
    assert sorted(out.event_id) == [0, 2, 3, 4]


def test_mad_outliers_exact_thresholds(ray_session):
    import ray.data

    from quichash_ray.pipelines.outliers import mad_outliers

    # group g: values 10×100 cents, 1×106, 1×1000 → med=100, MAD=0
    # → every v != 100 is an outlier at any k when MAD=0
    vals = [100] * 10 + [106, 1000]
    t = pa.table(
        {
            "event_id": pa.array(list(range(len(vals))), pa.int64()),
            "event_type": pa.array(["g"] * len(vals), pa.string()),
            "cents": pa.array(vals, pa.int64()),
        }
    )
    out = mad_outliers(ray.data.from_arrow(t), k=3).to_pandas()
    assert sorted(out.cents) == [106, 1000]

    # spread group: 1..9 → med=5, |dev|=4,3,2,1,0,1,2,3,4 → MAD=2,
    # k=1 → |v-5| > 2 → {1,2,8,9}
    t2 = pa.table(
        {
            "event_id": pa.array(list(range(9)), pa.int64()),
            "event_type": pa.array(["h"] * 9, pa.string()),
            "cents": pa.array(list(range(1, 10)), pa.int64()),
        }
    )
    out2 = mad_outliers(ray.data.from_arrow(t2), k=1).to_pandas()
    assert sorted(out2.cents) == [1, 2, 8, 9]


def test_profile_table_typed_minmax_and_nulls(ray_session):
    import ray.data

    from quichash_ray.pipelines.profile import profile_table

    # ints that stringify out of order (9 vs 10) across two blocks —
    # a string-domain combine would report min_v "10"
    t1 = pa.table(
        {
            "a": pa.array([9, 100], pa.int64()),
            "s": pa.array(["zz", None], pa.string()),
        }
    )
    t2 = pa.table(
        {
            "a": pa.array([10, None], pa.int64()),
            "s": pa.array(["aa", "mm"], pa.string()),
        }
    )
    out = profile_table(ray.data.from_arrow([t1, t2]))
    d = {r["column"]: r for r in out.to_pylist()}
    assert d["a"]["n_rows"] == 4 and d["a"]["n_null"] == 1
    assert d["a"]["min_v"] == "9" and d["a"]["max_v"] == "100"
    assert d["s"]["n_null"] == 1
    assert d["s"]["min_v"] == "aa" and d["s"]["max_v"] == "zz"


def test_rollup_stats_levels(ray_session):
    import ray.data

    from quichash_ray.pipelines.textstats import rollup_stats

    t = pa.table(
        {
            "lang": pa.array(["en", "en", "fr"], pa.string()),
            "source": pa.array(["a", "b", "a"], pa.string()),
            "n_chars": pa.array([10, 20, 40], pa.int64()),
        }
    )
    out = rollup_stats(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 3 + 2 + 2 + 1  # fine + lang + source + total
    total = out[out.lang.isna() & out.source.isna()].iloc[0]
    assert total.n_docs == 3 and total.sum_n_chars == 70
    en = out[(out.lang == "en") & out.source.isna()].iloc[0]
    assert en.n_docs == 2 and en.sum_n_chars == 30
    a = out[out.lang.isna() & (out.source == "a")].iloc[0]
    assert a.n_docs == 2 and a.sum_n_chars == 50


def test_group_length_quantiles_ceilrank(ray_session):
    import ray.data

    from quichash_ray.pipelines.textstats import group_length_quantiles

    # lang x: lengths 1..4 → p25=1 p50=2 p75=3; lang y: [5,5,7] → 5,5,7
    texts = ["w", "w w", "w w w", "w w w w", "a a a a a",
             "b b b b b", "c c c c c c c"]
    langs = ["x"] * 4 + ["y"] * 3
    t = pa.table(
        {
            "lang": pa.array(langs, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        group_length_quantiles(ray.data.from_arrow(t))
        .to_pandas()
        .set_index("lang")
    )
    x, y = out.loc["x"], out.loc["y"]
    assert (x.p25, x.p50, x.p75, x.n_docs) == (1, 2, 3, 4)
    assert (y.p25, y.p50, y.p75, y.n_docs) == (5, 5, 7, 3)


def test_ngram_novelty_owner_rule(ray_session):
    import ray.data

    from quichash_ray.pipelines.ngram import ngram_novelty

    base = "a b c d e f"  # grams (k=5): "a b c d e", "b c d e f"
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    base,                    # owns both its grams
                    base + " g",             # 3 grams, 2 owned by doc 1
                    "x y z w v u",           # all novel
                ],
                pa.string(),
            ),
        }
    )
    out = (
        ngram_novelty(ray.data.from_arrow(t), k=5)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert (out.loc[1].n_grams, out.loc[1].n_novel) == (2, 2)
    assert (out.loc[2].n_grams, out.loc[2].n_novel) == (3, 1)
    assert out.loc[2].novelty == 1 / 3
    assert (out.loc[3].n_grams, out.loc[3].n_novel) == (2, 2)
    assert out.loc[3].novelty == 1.0


def test_top_orders_join_semantics(ray_session):
    import datetime as dt

    import ray.data

    from quichash_ray.pipelines.analytics import top_orders_by_revenue

    cut = dt.datetime(1998, 1, 1)
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_orderdate": pa.array(
                [cut - dt.timedelta(days=9), cut - dt.timedelta(days=1),
                 cut],  # order 3 placed ON cutoff → excluded
                pa.timestamp("us"),
            ),
        }
    )
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3, 9], pa.int64()),
            "l_extendedprice": pa.array(
                [10.0, 5.0, 100.0, 7.0, 3.0], pa.float64()
            ),
            "l_discount": pa.array([0.0, 0.1, 0.05, 0.0, 0.0], pa.float64()),
            "l_shipdate": pa.array(
                [cut, cut + dt.timedelta(days=1),
                 cut - dt.timedelta(days=1),  # shipped before → excluded
                 cut, cut],
                pa.timestamp("us"),
            ),
        }
    )
    out = top_orders_by_revenue(
        ray.data.from_arrow(orders), ray.data.from_arrow(li), k=10
    ).to_pandas()
    # order 1: 1000*100 + 500*90 = 145000; order 2 item shipped early;
    # order 3 not placed before cutoff; key 9 has no order row
    assert out.o_orderkey.tolist() == [1]
    assert out.revenue.tolist() == [145000]


def test_chunk_documents_windows(ray_session):
    import ray.data

    from quichash_ray.pipelines.packing import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["  " + " ".join(toks) + "  ",  # edge whitespace
                 "a b c", None],
                pa.string(),
            ),
        }
    )
    out = (
        chunk_documents(ray.data.from_arrow(t), max_tok=4)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    d1 = out[out.doc_id == 1]
    assert list(d1.n_tok) == [4, 4, 2]
    assert d1.iloc[0].chunk_text == "t0 t1 t2 t3"
    assert d1.iloc[2].chunk_text == "t8 t9"
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0].chunk_text == "a b c"
    assert 3 not in set(out.doc_id)


def test_hash_exchange_accepts_pandas_blocks(ray_session):
    import pandas as pd
    import ray.data

    from quichash_ray.stages.exchange import hash_exchange

    # Ray Data can surface blocks as pandas (schema-less empties, or
    # upstream pandas-format maps) — the exchange must coerce, not crash
    dfs = [
        pd.DataFrame({"k": [1, 2, 3], "part": [0, 1, 0]}),
        pd.DataFrame({"k": pd.Series([], dtype="int64"),
                      "part": pd.Series([], dtype="int64")}),
    ]
    ds = ray.data.from_pandas(dfs)

    def agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "k" not in t.column_names:
            return pa.table({"s": pa.array([], pa.int64())})
        import pyarrow.compute as pc

        return pa.table(
            {"s": pa.array([pc.sum(t["k"]).as_py()], pa.int64())}
        )

    out = hash_exchange(ds, "part", agg, 2).to_pandas()
    assert sorted(out.s.dropna()) == [2, 4]


def test_dup_size_histogram(ray_session):
    import ray.data

    from quichash_ray.pipelines.dedup import digest_table, dup_size_histogram

    t = pa.table(
        {
            "path": pa.array([f"p{i}" for i in range(6)], pa.string()),
            "text": pa.array(
                ["x", "x", "x", "y", "y", "z"], pa.string()
            ),
        }
    )
    digests = digest_table(
        ray.data.from_arrow(t), content_col="text", key_cols=("path",)
    )
    out = (
        dup_size_histogram(digests)
        .to_pandas()
        .set_index("cnt")
        .sort_index()
    )
    assert out.loc[1].n_groups == 1 and out.loc[1].n_files == 1
    assert out.loc[2].n_groups == 1 and out.loc[2].n_files == 2
    assert out.loc[3].n_groups == 1 and out.loc[3].n_files == 3


def test_top_per_group_ranked(ray_session):
    import ray.data

    from quichash_ray.pipelines.sampling import top_per_group

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "source": pa.array(["s", "s", "s", "t"], pa.string()),
            "n_chars": pa.array([10, 30, 30, 5], pa.int64()),
        }
    )
    out = top_per_group(
        ray.data.from_arrow(t), k=2, score_col="n_chars"
    ).to_pandas()
    s = out[out.source == "s"].sort_values("rnk")
    # ties on score break to smaller id: 2 then 3; doc 1 cut at k=2
    assert list(s.doc_id) == [2, 3]
    assert list(out[out.source == "t"].doc_id) == [4]


def test_events_running_total(ray_session, tmp_path):
    import datetime as dt

    import pyarrow.parquet as pq

    import __ray_entry__ as entry

    t0 = dt.datetime(2024, 1, 1)
    t = pa.table(
        {
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "ts": pa.array(
                [t0, t0 + dt.timedelta(minutes=1),
                 t0 + dt.timedelta(minutes=2), t0],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "event_type": pa.array(["a"] * 4, pa.string()),
            "value": pa.array([1.0, 2.5, 0.25, 9.0], pa.float64()),
            "props": pa.array(["{}"] * 4, pa.string()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = (
        entry.queries()["events_running_total"](str(tmp_path))
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    assert list(out.running_cents) == [100, 350, 375, 900]
