"""Winnowing fingerprints: the SIGMOD'03 guarantees + pipeline behavior."""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa
import pytest

from quichash_ray.pipelines.winnow import _doc_fingerprints

K, W = 3, 4


def _brute(text: str, k: int, w: int) -> set[tuple[int, str]]:
    toks = text.split()
    grams = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(len(toks) - k + 1)
    ]
    n = len(grams)
    if n <= 0:
        return set()
    out = set()
    for s in range(0, max(0, n - w) + 1):
        h, negi = min((grams[i], -i) for i in range(s, min(s + w, n)))
        out.add((-negi, h))
    return out


def test_kernel_matches_brute_force_fuzz():
    rng = random.Random(11)
    words = ["fn", "let", "mut", "x", "y", "ret", "if", "else", "for", "use"]
    for _ in range(150):
        text = " ".join(
            rng.choice(words) for _ in range(rng.randint(0, 24))
        )
        for k, w in [(3, 4), (2, 3), (1, 2), (5, 4)]:
            pos, fps = _doc_fingerprints(text, k, w)
            got = {(int(p), f.decode()) for p, f in zip(pos, fps)}
            assert got == _brute(text, k, w)


def test_shared_run_guarantee():
    """any common token run of length >= w + k - 1 yields >= 1 shared
    fingerprint HASH between the two docs (the winnowing guarantee)."""
    rng = random.Random(23)
    vocab = [f"tok{i}" for i in range(50)]
    for _ in range(60):
        shared = [rng.choice(vocab) for _ in range(W + K - 1)]
        a = [rng.choice(vocab) for _ in range(rng.randint(0, 10))] + shared
        b = shared + [rng.choice(vocab) for _ in range(rng.randint(0, 10))]
        _, fa = _doc_fingerprints(" ".join(a), K, W)
        _, fb = _doc_fingerprints(" ".join(b), K, W)
        assert set(fa.tolist()) & set(fb.tolist())


def test_density_bound():
    """selected fingerprints are a sparse subset: <= n_windows and >= 1
    for any doc with >= k tokens."""
    rng = random.Random(5)
    toks = [f"w{rng.randint(0, 30)}" for _ in range(400)]
    pos, fps = _doc_fingerprints(" ".join(toks), K, W)
    n_grams = len(toks) - K + 1
    assert 1 <= len(pos) <= n_grams - W + 1
    # expected density ~ 2/(w+1); allow generous slack
    assert len(pos) <= n_grams * 0.75


def test_short_and_null_docs(ray_session):
    import ray.data

    from quichash_ray.pipelines.winnow import winnow_fingerprints

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["one two", "a b c", None, ""]),
        }
    )
    out = winnow_fingerprints(ray.data.from_arrow(t), k=3, w=4).to_pandas()
    # doc 1 has 2 tokens (< k) -> none; doc 2 has exactly one gram;
    # null and empty -> none
    assert sorted(out["doc_id"]) == [2]
    assert (out["pos"] == 0).all()


def test_clone_pairs_detect_planted(ray_session):
    import ray.data

    from quichash_ray.pipelines.winnow import clone_pairs

    rng = random.Random(3)
    vocab = [f"ident{i}" for i in range(200)]
    texts, ids = [], []
    for i in range(40):
        body = " ".join(rng.choice(vocab) for _ in range(30))
        texts.append(body)
        ids.append(i)
        if i % 4 == 0:
            texts.append("intro preamble tokens here " + body)
            ids.append(1000 + i)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )
    pairs = clone_pairs(ds, k=3, w=4, min_shared=2).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    for i in range(0, 40, 4):
        assert (i, 1000 + i) in found


def test_fp_cap_meters_drops(ray_session):
    """a fingerprint present in every doc is droppable via fp_cap, and the
    drop is metered on the metrics actor (no silent caps)."""
    import ray.data

    from quichash_ray.pipelines.winnow import clone_pairs
    from quichash_ray.state.metrics import read_metrics

    boiler = " ".join(f"b{j}" for j in range(10))
    t = pa.table(
        {
            "doc_id": pa.array(list(range(20)), pa.int64()),
            "text": pa.array([f"u{i} v{i} w{i} {boiler}" for i in range(20)]),
        }
    )
    before = read_metrics().get("ngram_dropped_grams", 0)
    pairs = clone_pairs(
        ray.data.from_arrow(t), k=3, w=4, min_shared=1, fp_cap=5
    ).to_pandas()
    after = read_metrics().get("ngram_dropped_grams", 0)
    assert after > before
    assert len(pairs) == 0
