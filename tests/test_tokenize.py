"""Vectorized tokenizer/CRC/shingle kernel (functions/tokenize.py) —
equivalence with the per-row reference path (`gram_hashes(text.split(), k)`)
and with zlib.crc32."""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from quichash_ray.functions.tokenize import batch_gram_hashes, crc32_tokens
from quichash_ray.pipelines.ngram import gram_hashes


def test_crc32_tokens_matches_zlib():
    rng = np.random.default_rng(0)
    toks = [
        bytes(rng.integers(33, 127, rng.integers(1, 30)).astype(np.uint8))
        for _ in range(500)
    ]
    buf = np.frombuffer(b"".join(toks), np.uint8)
    starts = np.cumsum([0] + [len(t) for t in toks[:-1]]).astype(np.int64)
    lens = np.array([len(t) for t in toks], np.int64)
    got = crc32_tokens(buf, starts, lens)
    exp = np.array([zlib.crc32(t) for t in toks], np.uint32)
    assert np.array_equal(got, exp)


def test_batch_gram_hashes_equals_per_row():
    rng = np.random.default_rng(1)
    docs = [
        "a b c d e f g h",
        "",
        "   ",
        "one two",
        "x " * 100,
        None,
        "tok1\ttok2\nnext doc line\r\nmore stuff here ok yes",
        " lead and trail  ",
        "a a a a a a a a",
        "short",
    ]
    docs += [
        " ".join(f"w{rng.integers(0, 50)}" for _ in range(rng.integers(0, 60)))
        for _ in range(200)
    ]
    col = pa.array(docs, pa.large_string())
    for k in (1, 2, 5):
        flat, offs, valid = batch_gram_hashes(col, k)
        for i, d in enumerate(docs):
            mine = flat[offs[i] : offs[i + 1]]
            if d is None:
                assert len(mine) == 0 and not valid[i]
            else:
                ref = gram_hashes(d.split(), k)
                assert np.array_equal(mine, ref), (k, i, d[:40])


def test_batch_gram_hashes_sliced_column():
    col = pa.array(
        [
            "aa bb cc dd ee ff",
            "gg hh ii jj kk ll",
            "mm nn oo pp qq rr",
        ],
        pa.large_string(),
    ).slice(1, 2)
    flat, offs, valid = batch_gram_hashes(col, 5)
    for i, d in enumerate(["gg hh ii jj kk ll", "mm nn oo pp qq rr"]):
        assert np.array_equal(
            flat[offs[i] : offs[i + 1]], gram_hashes(d.split(), 5)
        )
