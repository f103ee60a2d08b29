"""Digest-parity vectors — the reference's golden hash tests (SURVEY §5.1).

Vectors cite /root/reference/src/hash.rs and FIXTURES.md §2.
"""

from __future__ import annotations

import hashlib

import pytest

from quichash_ray.functions import hashes
from quichash_ray.functions.fastmode import fast_digest_hex, fast_sample

HELLO_WORLD_SHA256 = (
    "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9"
)
EMPTY_SHA256 = (
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
)


class TestGoldenVectors:
    def test_sha256_hello_world(self):  # hash.rs:1101, scan.rs:796
        assert hashes.digest_hex("hello world", "sha256") == HELLO_WORLD_SHA256

    def test_sha256_empty(self):  # hash.rs:1320
        assert hashes.digest_hex("", "sha256") == EMPTY_SHA256

    def test_sha256_hello_and_world(self):  # verify.rs:479-480
        assert (
            hashes.digest_hex("hello", "sha256")
            == "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824"
        )
        assert (
            hashes.digest_hex("world", "sha256")
            == "486ea46224d1bb4fb680f34f7c9ad96a8f24ec88be73ea8e5a6c65260e9cb8a7"
        )

    def test_sha256_utf8(self):  # hash.rs:1325-1333: UTF-8 bytes hashed
        h = hashes.digest_hex("Hello, 世界! 🌍", "sha256")
        assert len(h) == 64
        assert h == hashlib.sha256("Hello, 世界! 🌍".encode()).hexdigest()

    def test_xxh3_len_and_le(self):  # hash.rs:287, hash.rs:1381-1389
        h = hashes.digest_hex("hello world", "xxh3")
        assert len(h) == 16
        # LE hex of the published canonical XXH3-64("hello world") value
        assert h == (0xD447B1EA40E6988B).to_bytes(8, "little").hex()

    def test_xxh128_len_and_le(self):  # hash.rs:307, hash.rs:1392-1400
        h = hashes.digest_hex("hello world", "xxh128")
        assert len(h) == 32

    def test_xxh3_empty_canonical(self):
        # published XXH3_64bits("") == 0x2d06800538d394c2
        assert (
            hashes.digest_hex("", "xxh3")
            == (0x2D06800538D394C2).to_bytes(8, "little").hex()
        )

    def test_xxh128_empty_canonical(self):
        # published XXH128("") == 0x99aa06d3014798d86001c324468d497f
        assert (
            hashes.digest_hex("", "xxh128")
            == (0x99AA06D3014798D86001C324468D497F).to_bytes(16, "little").hex()
        )

    def test_blake3_empty_canonical(self):
        assert (
            hashes.digest_hex("", "blake3")
            == "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262"
        )

    def test_blake3_hello_world_canonical(self):
        assert (
            hashes.digest_hex("hello world", "blake3")
            == "d74981efa70a0c880b8d8c1985d075dbcbf679b99a5f9914e5aaf96b831a9e24"
        )

    def test_determinism(self):  # hash.rs:1403-1420
        for algo in ("xxh3", "xxh128", "blake3"):
            a = hashes.digest_hex("consistent test", algo)
            b = hashes.digest_hex("consistent test", algo)
            assert a == b

    @pytest.mark.parametrize(
        "algo,bits",
        [
            ("md5", 128), ("sha1", 160), ("sha224", 224), ("sha256", 256),
            ("sha384", 384), ("sha512", 512), ("sha3-224", 224),
            ("sha3-256", 256), ("sha3-384", 384), ("sha3-512", 512),
            ("blake2b-512", 512), ("blake2s-256", 256), ("blake3", 256),
            ("xxh3", 64), ("xxh128", 128),
        ],
    )
    def test_output_lengths(self, algo, bits):  # hash.rs:346-439 catalog
        assert len(hashes.digest_hex("hello world", algo)) == bits // 4

    def test_hashlib_cross_check(self):
        data = b"the quick brown fox"
        assert hashes.digest_hex(data, "md5") == hashlib.md5(data).hexdigest()
        assert hashes.digest_hex(data, "sha3-256") == hashlib.sha3_256(data).hexdigest()
        assert (
            hashes.digest_hex(data, "blake2b-512")
            == hashlib.blake2b(data, digest_size=64).hexdigest()
        )
        assert (
            hashes.digest_hex(data, "blake2s-256")
            == hashlib.blake2s(data, digest_size=32).hexdigest()
        )


class TestAliases:
    @pytest.mark.parametrize(
        "alias,canonical",
        [
            ("SHA256", "sha256"), ("sha-256", "sha256"), ("Sha-256", "sha256"),
            ("Blake3", "blake3"), ("BLAKE3", "blake3"),
            ("blake2b", "blake2b-512"), ("blake2s", "blake2s-256"),
            ("XXH3", "xxh3"), ("sha-512", "sha512"), ("SHA3-256", "sha3-256"),
        ],
    )
    def test_alias_resolution(self, alias, canonical):  # hash.rs:321-338
        assert hashes.canonical_name(alias) == canonical
        assert hashes.digest_hex("x", alias) == hashes.digest_hex("x", canonical)

    def test_invalid_algorithm_raises(self):  # hash.rs:1369-1378
        with pytest.raises(hashes.UnsupportedAlgorithmError):
            hashes.digest_hex("x", "invalid_algorithm")

    def test_catalog(self):
        cat = hashes.list_algorithms()
        assert len(cat) == 15
        assert {a.name for a in cat} >= {"MD5", "BLAKE3", "XXH3", "XXH128"}

    def test_post_quantum(self):  # hash.rs:443-449
        assert hashes.is_post_quantum("sha3-256")
        assert hashes.is_post_quantum("SHA3-512")
        assert not hashes.is_post_quantum("sha256")
        assert not hashes.is_post_quantum("blake3")

    def test_infer_from_hex_length(self):  # database.rs:404-414
        assert hashes.infer_algorithm_from_hex("a" * 64) == "sha256"
        assert hashes.infer_algorithm_from_hex("a" * 32) == "md5"
        assert hashes.infer_algorithm_from_hex("a" * 40) == "sha1"
        assert hashes.infer_algorithm_from_hex("a" * 128) == "sha512"
        assert hashes.infer_algorithm_from_hex("a" * 7) is None

    def test_register_algorithm(self):  # Hasher-trait analog, hash.rs:12-21
        hashes.register_algorithm("testalgo", lambda d: bytes([len(d) % 256]))
        assert hashes.digest_hex("abc", "testalgo") == "03"


class TestFastMode:
    """FIXTURES.md §3 — scaled-down S=1024, threshold 3072."""

    S = 1024

    def test_small_fast_equals_normal(self):  # hash.rs:1186-1206
        data = b"x" * (3 * self.S - 1)
        assert fast_digest_hex(data, "sha256", self.S) == hashes.digest_hex(
            data, "sha256"
        )

    def test_large_is_sampled(self):  # hash.rs:1228-1251
        data = bytes(range(256)) * 20  # 5120 > 3S
        sampled = fast_sample(data, self.S)
        assert len(sampled) == 3 * self.S
        mid_start = len(data) // 2 - self.S // 2
        assert sampled == (
            data[: self.S]
            + data[mid_start : mid_start + self.S]
            + data[-self.S :]
        )
        assert fast_digest_hex(data, "sha256", self.S) == hashes.digest_hex(
            sampled, "sha256"
        )

    def test_boundary_exact_threshold(self):
        # len == 3S → sampled (reference: `< threshold` hashes full file)
        data = b"ab" * (3 * self.S // 2)
        assert len(data) == 3 * self.S
        assert len(fast_sample(data, self.S)) == 3 * self.S

    def test_determinism(self):  # hash.rs:1209-1225
        data = bytes(range(251)) * 40
        assert fast_digest_hex(data, "sha256", self.S) == fast_digest_hex(
            data, "sha256", self.S
        )

    def test_middle_window_overlap_at_3s_plus_1(self):
        data = b"z" * (3 * self.S + 1)
        sampled = fast_sample(data, self.S)
        assert len(sampled) == 3 * self.S


class TestHumanSize:
    def test_formatting(self):  # compare.rs:60-74
        from quichash_ray.functions.text import human_size

        assert human_size(512) == "512 B"
        assert human_size(2048) == "2.00 KB"
        assert human_size(5 * 1024 * 1024) == "5.00 MB"
        assert human_size(3 * 1024**3) == "3.00 GB"
        assert human_size(2 * 1024**4) == "2.00 TB"
