"""Property-based tests (hypothesis) — beyond the reference's test strategy
(it has none; SURVEY §5). Invariants over arbitrary inputs for the pure
kernels."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from quichash_ray.functions import hashes
from quichash_ray.functions.fastmode import fast_digest_hex, fast_sample
from quichash_ray.functions.pathnorm import clean_path, normalize_separators
from quichash_ray.pipelines.ngram import gram_hashes

ALGOS = [
    "md5", "sha1", "sha256", "sha512", "sha3-256", "blake2b-512", "xxh3",
    "xxh128", "blake3",
]


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=4096), st.sampled_from(ALGOS))
def test_digest_hex_shape_and_determinism(data, algo):
    h1 = hashes.digest_hex(data, algo)
    h2 = hashes.digest_hex(data, algo)
    assert h1 == h2
    assert len(h1) == hashes.output_size_bytes(algo) * 2
    assert all(c in "0123456789abcdef" for c in h1)


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=2048), st.binary(min_size=1, max_size=8))
def test_digest_injective_on_append(data, suffix):
    # appending bytes must change the digest (collision would be a bug here)
    assert hashes.digest_hex(data, "sha256") != hashes.digest_hex(
        data + suffix, "sha256"
    )


@settings(max_examples=50, deadline=None)
@given(
    st.binary(min_size=0, max_size=8192),
    st.integers(min_value=8, max_value=512),
)
def test_fast_sample_invariants(data, s):
    out = fast_sample(data, s)
    if len(data) < 3 * s:
        assert out == data
    else:
        assert len(out) == 3 * s
        assert out[:s] == data[:s]
        assert out[-s:] == data[-s:]
    # digest of the sample equals the fast digest
    assert fast_digest_hex(data, "sha256", s) == hashes.digest_hex(
        out, "sha256"
    )


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="abcXYZ09_", min_size=1, max_size=6),
                min_size=0, max_size=60),
       st.integers(min_value=1, max_value=7))
def test_gram_hashes_properties(tokens, k):
    g = gram_hashes(tokens, k)
    # sorted unique
    assert list(g) == sorted(set(g.tolist()))
    if len(tokens) < k:
        assert len(g) == 0
    else:
        assert 1 <= len(g) <= len(tokens) - k + 1
    # permutation-sensitivity: shingles of reversed token list generally
    # differ unless palindromic; at minimum determinism holds
    assert list(gram_hashes(tokens, k)) == list(g)


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="abAB9./\\_- ", min_size=0, max_size=40))
def test_path_normalization_idempotent(p):
    once = clean_path(p)
    assert clean_path(once) == once
    assert "\\" not in normalize_separators(p)
