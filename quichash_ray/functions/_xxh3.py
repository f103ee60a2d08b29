"""Pure-Python XXH3 (64-bit and 128-bit one-shot hashes, seed=0).

Implemented from the public xxHash specification (BSD-2, Yann Collet,
https://github.com/Cyan4973/xxHash). The ``xxhash`` C wheel is not available in
this environment; this module provides byte-identical digests for the parity
surface of the reference engine (see /root/reference/src/hash.rs:275-313, which
wraps ``xxhash_rust::xxh3``). Install the ``xxhash`` wheel in production for
throughput — :mod:`quichash_ray.functions.hashes` prefers it automatically.

Only the one-shot, default-secret, seed=0 path is implemented (that is all the
reference uses: ``Xxh3Hasher::new()`` → update → digest).
"""

from __future__ import annotations

import struct

_M64 = 0xFFFFFFFFFFFFFFFF
_M32 = 0xFFFFFFFF

PRIME32_1 = 0x9E3779B1
PRIME32_2 = 0x85EBCA77
PRIME32_3 = 0xC2B2AE3D
PRIME64_1 = 0x9E3779B185EBCA87
PRIME64_2 = 0xC2B2AE3D27D4EB4F
PRIME64_3 = 0x165667B19E3779F9
PRIME64_4 = 0x85EBCA77C2B2AE63
PRIME64_5 = 0x27D4EB2F165667C5
PRIME_MX1 = 0x165667919E3779F9
PRIME_MX2 = 0x9FB21C651E98DF25

# The canonical 192-byte default secret (kSecret) from the xxHash spec,
# listed as 16-byte rows.
_SECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1c"
    "ded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221"
    "b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea3"
    "71644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d"
    "8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb"
    "170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce"
    "45cb3a8f9516042815652ab98744407e"
)
assert len(_SECRET) == 192

_u64 = struct.Struct("<Q").unpack_from
_u32 = struct.Struct("<I").unpack_from


def _read64(b: bytes, off: int) -> int:
    return _u64(b, off)[0]


def _read32(b: bytes, off: int) -> int:
    return _u32(b, off)[0]


def _swap32(x: int) -> int:
    return int.from_bytes((x & _M32).to_bytes(4, "little"), "big")


def _swap64(x: int) -> int:
    return int.from_bytes((x & _M64).to_bytes(8, "little"), "big")


def _rotl64(x: int, r: int) -> int:
    x &= _M64
    return ((x << r) | (x >> (64 - r))) & _M64


def _rotl32(x: int, r: int) -> int:
    x &= _M32
    return ((x << r) | (x >> (32 - r))) & _M32


def _mul128_fold64(a: int, b: int) -> int:
    p = (a & _M64) * (b & _M64)
    return ((p & _M64) ^ (p >> 64)) & _M64


def _xxh64_avalanche(h: int) -> int:
    h &= _M64
    h ^= h >> 33
    h = (h * PRIME64_2) & _M64
    h ^= h >> 29
    h = (h * PRIME64_3) & _M64
    h ^= h >> 32
    return h


def _xxh3_avalanche(h: int) -> int:
    h &= _M64
    h ^= h >> 37
    h = (h * PRIME_MX1) & _M64
    h ^= h >> 32
    return h


def _rrmxmx(h: int, length: int) -> int:
    h &= _M64
    h ^= _rotl64(h, 49) ^ _rotl64(h, 24)
    h = (h * PRIME_MX2) & _M64
    h ^= (h >> 35) + length
    h &= _M64
    h = (h * PRIME_MX2) & _M64
    h ^= h >> 28
    return h


def _mix16(data: bytes, doff: int, secret: bytes, soff: int) -> int:
    lo = _read64(data, doff) ^ _read64(secret, soff)
    hi = _read64(data, doff + 8) ^ _read64(secret, soff + 8)
    return _mul128_fold64(lo, hi)


# ---------------------------------------------------------------------------
# long-input (>240 bytes) striped accumulation, shared by 64- and 128-bit
# ---------------------------------------------------------------------------

_INIT_ACC = [
    PRIME32_3,
    PRIME64_1,
    PRIME64_2,
    PRIME64_3,
    PRIME64_4,
    PRIME32_2,
    PRIME64_5,
    PRIME32_1,
]

_STRIPES_PER_BLOCK = (len(_SECRET) - 64) // 8  # 16
_BLOCK_LEN = 64 * _STRIPES_PER_BLOCK  # 1024


def _accumulate512(acc: list[int], data: bytes, doff: int, soff: int) -> None:
    for i in range(8):
        data_val = _read64(data, doff + 8 * i)
        data_key = data_val ^ _read64(_SECRET, soff + 8 * i)
        acc[i ^ 1] = (acc[i ^ 1] + data_val) & _M64
        acc[i] = (acc[i] + (data_key & _M32) * (data_key >> 32)) & _M64


def _scramble(acc: list[int]) -> None:
    soff = len(_SECRET) - 64
    for i in range(8):
        a = acc[i]
        a ^= a >> 47
        a ^= _read64(_SECRET, soff + 8 * i)
        acc[i] = (a * PRIME32_1) & _M64


def _hash_long_accs(data: bytes) -> list[int]:
    length = len(data)
    acc = list(_INIT_ACC)
    nb_blocks = (length - 1) // _BLOCK_LEN
    for b in range(nb_blocks):
        base = b * _BLOCK_LEN
        for s in range(_STRIPES_PER_BLOCK):
            _accumulate512(acc, data, base + 64 * s, 8 * s)
        _scramble(acc)
    # last (partial) block
    base = nb_blocks * _BLOCK_LEN
    nb_stripes = (length - 1 - base) // 64
    for s in range(nb_stripes):
        _accumulate512(acc, data, base + 64 * s, 8 * s)
    # final stripe: last 64 bytes of input, secret offset secretSize-64-7
    _accumulate512(acc, data, length - 64, len(_SECRET) - 64 - 7)
    return acc


def _merge_accs(acc: list[int], soff: int, start: int) -> int:
    result = start & _M64
    for i in range(4):
        result = (
            result
            + _mul128_fold64(
                acc[2 * i] ^ _read64(_SECRET, soff + 16 * i),
                acc[2 * i + 1] ^ _read64(_SECRET, soff + 16 * i + 8),
            )
        ) & _M64
    return _xxh3_avalanche(result)


# ---------------------------------------------------------------------------
# XXH3 64-bit
# ---------------------------------------------------------------------------


def xxh3_64(data: bytes) -> int:
    """One-shot XXH3-64, default secret, seed=0. Returns a 64-bit int."""
    n = len(data)
    if n == 0:
        return _xxh64_avalanche(_read64(_SECRET, 56) ^ _read64(_SECRET, 64))
    if n <= 3:
        combined = (
            data[n - 1] | (n << 8) | (data[0] << 16) | (data[n >> 1] << 24)
        )
        keyed = (_read32(_SECRET, 0) ^ _read32(_SECRET, 4)) & _M64
        return _xxh64_avalanche((combined ^ keyed) & _M64)
    if n <= 8:
        input_lo = _read32(data, 0)
        input_hi = _read32(data, n - 4)
        bitflip = (_read64(_SECRET, 8) ^ _read64(_SECRET, 16)) & _M64
        input64 = (input_hi + (input_lo << 32)) & _M64
        return _rrmxmx(input64 ^ bitflip, n)
    if n <= 16:
        bitflip1 = (_read64(_SECRET, 24) ^ _read64(_SECRET, 32)) & _M64
        bitflip2 = (_read64(_SECRET, 40) ^ _read64(_SECRET, 48)) & _M64
        input_lo = _read64(data, 0) ^ bitflip1
        input_hi = _read64(data, n - 8) ^ bitflip2
        acc = (
            n
            + _swap64(input_lo)
            + input_hi
            + _mul128_fold64(input_lo, input_hi)
        ) & _M64
        return _xxh3_avalanche(acc)
    if n <= 128:
        acc = (n * PRIME64_1) & _M64
        if n > 32:
            if n > 64:
                if n > 96:
                    acc = (acc + _mix16(data, 48, _SECRET, 96)) & _M64
                    acc = (acc + _mix16(data, n - 64, _SECRET, 112)) & _M64
                acc = (acc + _mix16(data, 32, _SECRET, 64)) & _M64
                acc = (acc + _mix16(data, n - 48, _SECRET, 80)) & _M64
            acc = (acc + _mix16(data, 16, _SECRET, 32)) & _M64
            acc = (acc + _mix16(data, n - 32, _SECRET, 48)) & _M64
        acc = (acc + _mix16(data, 0, _SECRET, 0)) & _M64
        acc = (acc + _mix16(data, n - 16, _SECRET, 16)) & _M64
        return _xxh3_avalanche(acc)
    if n <= 240:
        acc = (n * PRIME64_1) & _M64
        for i in range(8):
            acc = (acc + _mix16(data, 16 * i, _SECRET, 16 * i)) & _M64
        acc = _xxh3_avalanche(acc)
        nb_rounds = n // 16
        for i in range(8, nb_rounds):
            # XXH3_MIDSIZE_STARTOFFSET = 3
            acc = (acc + _mix16(data, 16 * i, _SECRET, 16 * (i - 8) + 3)) & _M64
        # XXH3_MIDSIZE_LASTOFFSET = 17; SECRET_SIZE_MIN = 136
        acc = (acc + _mix16(data, n - 16, _SECRET, 136 - 17)) & _M64
        return _xxh3_avalanche(acc)
    # long
    acc = _hash_long_accs(data)
    # XXH_SECRET_MERGEACCS_START = 11
    return _merge_accs(acc, 11, (n * PRIME64_1) & _M64)


# ---------------------------------------------------------------------------
# XXH3 128-bit
# ---------------------------------------------------------------------------


def _mix32b(
    acc_lo: int,
    acc_hi: int,
    data: bytes,
    off1: int,
    off2: int,
    soff: int,
) -> tuple[int, int]:
    acc_lo = (acc_lo + _mix16(data, off1, _SECRET, soff)) & _M64
    acc_lo ^= (_read64(data, off2) + _read64(data, off2 + 8)) & _M64
    acc_hi = (acc_hi + _mix16(data, off2, _SECRET, soff + 16)) & _M64
    acc_hi ^= (_read64(data, off1) + _read64(data, off1 + 8)) & _M64
    return acc_lo, acc_hi


def xxh3_128(data: bytes) -> int:
    """One-shot XXH3-128, default secret, seed=0. Returns a 128-bit int
    (``(high64 << 64) | low64``, matching the canonical value)."""
    n = len(data)
    if n == 0:
        lo = _xxh64_avalanche(_read64(_SECRET, 64) ^ _read64(_SECRET, 72))
        hi = _xxh64_avalanche(_read64(_SECRET, 80) ^ _read64(_SECRET, 88))
        return (hi << 64) | lo
    if n <= 3:
        combinedl = (
            data[n - 1] | (n << 8) | (data[0] << 16) | (data[n >> 1] << 24)
        )
        combinedh = _rotl32(_swap32(combinedl), 13)
        bitflipl = (_read32(_SECRET, 0) ^ _read32(_SECRET, 4)) & _M64
        bitfliph = (_read32(_SECRET, 8) ^ _read32(_SECRET, 12)) & _M64
        lo = _xxh64_avalanche((combinedl ^ bitflipl) & _M64)
        hi = _xxh64_avalanche((combinedh ^ bitfliph) & _M64)
        return (hi << 64) | lo
    if n <= 8:
        input_lo = _read32(data, 0)
        input_hi = _read32(data, n - 4)
        input64 = (input_lo + (input_hi << 32)) & _M64
        bitflip = (_read64(_SECRET, 16) ^ _read64(_SECRET, 24)) & _M64
        keyed = input64 ^ bitflip
        p = keyed * ((PRIME64_1 + (n << 2)) & _M64)
        m_lo = p & _M64
        m_hi = (p >> 64) & _M64
        m_hi = (m_hi + ((m_lo << 1) & _M64)) & _M64
        m_lo ^= m_hi >> 3
        m_lo ^= m_lo >> 35
        m_lo = (m_lo * PRIME_MX2) & _M64
        m_lo ^= m_lo >> 28
        m_hi = _xxh3_avalanche(m_hi)
        return (m_hi << 64) | m_lo
    if n <= 16:
        bitflipl = (_read64(_SECRET, 32) ^ _read64(_SECRET, 40)) & _M64
        bitfliph = (_read64(_SECRET, 48) ^ _read64(_SECRET, 56)) & _M64
        input_lo = _read64(data, 0)
        input_hi = _read64(data, n - 8)
        p = ((input_lo ^ input_hi ^ bitflipl) & _M64) * PRIME64_1
        m_lo = p & _M64
        m_hi = (p >> 64) & _M64
        m_lo = (m_lo + (((n - 1) << 54) & _M64)) & _M64
        input_hi ^= bitfliph
        m_hi = (
            m_hi + input_hi + ((input_hi & _M32) * (PRIME32_2 - 1))
        ) & _M64
        m_lo ^= _swap64(m_hi)
        q = m_lo * PRIME64_2
        h_lo = q & _M64
        h_hi = ((q >> 64) + m_hi * PRIME64_2) & _M64
        return (_xxh3_avalanche(h_hi) << 64) | _xxh3_avalanche(h_lo)
    if n <= 128:
        acc_lo = (n * PRIME64_1) & _M64
        acc_hi = 0
        i = (n - 1) // 32
        while i >= 0:
            acc_lo, acc_hi = _mix32b(
                acc_lo, acc_hi, data, 16 * i, n - 16 * (i + 1), 32 * i
            )
            i -= 1
        h_lo = (acc_lo + acc_hi) & _M64
        h_hi = (
            acc_lo * PRIME64_1 + acc_hi * PRIME64_4 + n * PRIME64_2
        ) & _M64
        h_lo = _xxh3_avalanche(h_lo)
        h_hi = (-_xxh3_avalanche(h_hi)) & _M64
        return (h_hi << 64) | h_lo
    if n <= 240:
        acc_lo = (n * PRIME64_1) & _M64
        acc_hi = 0
        for i in range(4):
            acc_lo, acc_hi = _mix32b(
                acc_lo, acc_hi, data, 32 * i, 32 * i + 16, 32 * i
            )
        acc_lo = _xxh3_avalanche(acc_lo)
        acc_hi = _xxh3_avalanche(acc_hi)
        nb_rounds = n // 32
        for i in range(4, nb_rounds):
            acc_lo, acc_hi = _mix32b(
                acc_lo,
                acc_hi,
                data,
                32 * i,
                32 * i + 16,
                3 + 32 * (i - 4),  # XXH3_MIDSIZE_STARTOFFSET
            )
        acc_lo, acc_hi = _mix32b(
            acc_lo, acc_hi, data, n - 16, n - 32, 136 - 17 - 16
        )
        h_lo = (acc_lo + acc_hi) & _M64
        h_hi = (
            acc_lo * PRIME64_1 + acc_hi * PRIME64_4 + n * PRIME64_2
        ) & _M64
        h_lo = _xxh3_avalanche(h_lo)
        h_hi = (-_xxh3_avalanche(h_hi)) & _M64
        return (h_hi << 64) | h_lo
    acc = _hash_long_accs(data)
    h_lo = _merge_accs(acc, 11, (n * PRIME64_1) & _M64)
    h_hi = _merge_accs(
        acc, len(_SECRET) - 64 - 11, (~(n * PRIME64_2)) & _M64
    )
    return (h_hi << 64) | h_lo


def xxh3_64_digest_le(data: bytes) -> bytes:
    """8-byte little-endian digest — matches the reference's
    ``to_le_bytes`` serialization (/root/reference/src/hash.rs:287)."""
    return xxh3_64(data).to_bytes(8, "little")


def xxh3_128_digest_le(data: bytes) -> bytes:
    """16-byte little-endian digest of the canonical 128-bit value —
    matches ``u128::to_le_bytes`` (/root/reference/src/hash.rs:307)."""
    return xxh3_128(data).to_bytes(16, "little")
