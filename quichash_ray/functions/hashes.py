"""Digest-kernel registry — the parity core of the engine.

Mirrors the reference's algorithm registry and aliasing semantics
(/root/reference/src/hash.rs:320-343): 15 algorithms, case-insensitive names,
``sha-256``-style dash aliases, ``blake2b``/``blake2s`` short names, and an
``UnsupportedAlgorithmError`` for anything else. Hex output is lowercase
(%02x per byte, /root/reference/src/hash.rs:1076-1080).

Parity traps handled here:

- xxh3 / xxh128 hex is of the **little-endian** digest bytes
  (``to_le_bytes``, /root/reference/src/hash.rs:287,307).
- blake2b is the 512-bit variant, blake2s the 256-bit variant.

Every function here is a pure ``bytes -> bytes`` kernel — stateless, cheap to
ship to Ray workers, and trivially registrable by user code via
:func:`register_algorithm` (the analog of the reference's ``Hasher`` trait
plugin point, /root/reference/src/hash.rs:12-21).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Callable

try:  # prefer the C wheel when present (production)
    import xxhash as _xxhash_c
except ImportError:  # pragma: no cover - env without the wheel
    _xxhash_c = None

try:  # prefer the C wheel when present (production)
    import blake3 as _blake3_c
except ImportError:  # pragma: no cover
    _blake3_c = None

from quichash_ray.functions import _blake3 as _blake3_py
from quichash_ray.functions import _xxh3 as _xxh3_py


class UnsupportedAlgorithmError(ValueError):
    """Raised for unknown algorithm names (hash.rs:339-341 analog)."""

    def __init__(self, algorithm: str):
        super().__init__(f"unsupported hash algorithm: {algorithm!r}")
        self.algorithm = algorithm


def _hashlib_fn(name: str) -> Callable[[bytes], bytes]:
    def fn(data: bytes, _name: str = name) -> bytes:
        return hashlib.new(_name, data).digest()

    return fn


def _xxh3_digest(data: bytes) -> bytes:
    if _xxhash_c is not None:
        return _xxhash_c.xxh3_64(data).intdigest().to_bytes(8, "little")
    return _xxh3_py.xxh3_64_digest_le(data)


def _xxh128_digest(data: bytes) -> bytes:
    if _xxhash_c is not None:
        return _xxhash_c.xxh3_128(data).intdigest().to_bytes(16, "little")
    return _xxh3_py.xxh3_128_digest_le(data)


def _blake3_digest(data: bytes) -> bytes:
    if _blake3_c is not None:
        return _blake3_c.blake3(data).digest()
    return _blake3_py.blake3(data)


@dataclass(frozen=True)
class AlgorithmInfo:
    """Catalog row — mirrors hash.rs:24-30 / list_algorithms (hash.rs:346-439)."""

    name: str
    output_bits: int
    post_quantum: bool
    cryptographic: bool


# canonical name -> digest fn (bytes -> raw digest bytes)
_ALGOS: dict[str, Callable[[bytes], bytes]] = {
    "md5": _hashlib_fn("md5"),
    "sha1": _hashlib_fn("sha1"),
    "sha224": _hashlib_fn("sha224"),
    "sha256": _hashlib_fn("sha256"),
    "sha384": _hashlib_fn("sha384"),
    "sha512": _hashlib_fn("sha512"),
    "sha3-224": _hashlib_fn("sha3_224"),
    "sha3-256": _hashlib_fn("sha3_256"),
    "sha3-384": _hashlib_fn("sha3_384"),
    "sha3-512": _hashlib_fn("sha3_512"),
    "blake2b-512": lambda d: hashlib.blake2b(d, digest_size=64).digest(),
    "blake2s-256": lambda d: hashlib.blake2s(d, digest_size=32).digest(),
    "blake3": _blake3_digest,
    "xxh3": _xxh3_digest,
    "xxh128": _xxh128_digest,
}

# alias -> canonical, mirroring the match arms at hash.rs:323-338
_ALIASES: dict[str, str] = {
    "sha-224": "sha224",
    "sha-256": "sha256",
    "sha-384": "sha384",
    "sha-512": "sha512",
    "blake2b": "blake2b-512",
    "blake2s": "blake2s-256",
}

_CATALOG: list[AlgorithmInfo] = [
    AlgorithmInfo("MD5", 128, False, True),
    AlgorithmInfo("SHA1", 160, False, True),
    AlgorithmInfo("SHA-224", 224, False, True),
    AlgorithmInfo("SHA-256", 256, False, True),
    AlgorithmInfo("SHA-384", 384, False, True),
    AlgorithmInfo("SHA-512", 512, False, True),
    AlgorithmInfo("SHA3-224", 224, True, True),
    AlgorithmInfo("SHA3-256", 256, True, True),
    AlgorithmInfo("SHA3-384", 384, True, True),
    AlgorithmInfo("SHA3-512", 512, True, True),
    AlgorithmInfo("BLAKE2b-512", 512, False, True),
    AlgorithmInfo("BLAKE2s-256", 256, False, True),
    AlgorithmInfo("BLAKE3", 256, False, True),
    AlgorithmInfo("XXH3", 64, False, False),
    AlgorithmInfo("XXH128", 128, False, False),
]

# hex-digest length -> inferred algorithm, mirroring database.rs:404-414
_HEX_LEN_TO_ALGO: dict[int, str] = {
    32: "md5",
    40: "sha1",
    56: "sha224",
    64: "sha256",
    96: "sha384",
    128: "sha512",
    16: "xxh3",
}


def canonical_name(algorithm: str) -> str:
    """Resolve case-insensitive / dashed aliases to the canonical name."""
    low = algorithm.lower()
    low = _ALIASES.get(low, low)
    if low not in _ALGOS:
        raise UnsupportedAlgorithmError(algorithm)
    return low


def is_pure_python_fallback(algorithm: str) -> bool:
    """True when ``algorithm`` runs on the bundled pure-Python
    implementation (no C wheel in this environment) — parity-only speed."""
    name = canonical_name(algorithm)
    if name in ("xxh3", "xxh128"):
        return _xxhash_c is None
    if name == "blake3":
        return _blake3_c is None
    return False


def get_digest_fn(algorithm: str) -> Callable[[bytes], bytes]:
    """Look up a ``bytes -> digest-bytes`` kernel by (aliased) name."""
    return _ALGOS[canonical_name(algorithm)]


def digest_hex(data: bytes | str, algorithm: str = "sha256") -> str:
    """Hex digest of ``data`` — lowercase, LE-packed for xxh3/xxh128.

    Strings are hashed as their UTF-8 bytes (reference ``compute_hash_text``,
    hash.rs:489-545).
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    return get_digest_fn(algorithm)(data).hex()


def register_algorithm(name: str, fn: Callable[[bytes], bytes]) -> None:
    """User-extension point (the ``Hasher`` trait analog, hash.rs:12-21)."""
    _ALGOS[name.lower()] = fn


def list_algorithms() -> list[AlgorithmInfo]:
    """The 15-row algorithm catalog (hash.rs:346-439)."""
    return list(_CATALOG)


def is_post_quantum(algorithm: str) -> bool:
    """SHA-3 family (and SHAKE names) count as post-quantum (hash.rs:443-449)."""
    low = algorithm.lower()
    return low.startswith("sha3-") or low in ("shake128", "shake256")


def infer_algorithm_from_hex(hex_digest: str) -> str | None:
    """Infer algorithm from hex length — legacy-DB ingest (database.rs:404-414)."""
    return _HEX_LEN_TO_ALGO.get(len(hex_digest))


def output_size_bytes(algorithm: str) -> int:
    """Digest length in bytes for a canonical/aliased algorithm name."""
    return len(get_digest_fn(algorithm)(b""))
