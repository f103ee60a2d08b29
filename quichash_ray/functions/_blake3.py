"""Pure-Python BLAKE3 (default 32-byte digest, hash mode only).

Implemented from the public BLAKE3 specification / reference implementation
(https://github.com/BLAKE3-team/BLAKE3, CC0). The ``blake3`` C wheel is not
available in this environment; this module provides byte-identical digests for
the parity surface of the reference engine (/root/reference/src/hash.rs:236-273
wraps the official ``blake3`` crate; /root/reference/src/dedup.rs:279-282
hard-codes blake3 for its dedup command). Install the ``blake3`` wheel in
production — :mod:`quichash_ray.functions.hashes` prefers it automatically.
"""

from __future__ import annotations

import struct

_M32 = 0xFFFFFFFF

IV = (
    0x6A09E667,
    0xBB67AE85,
    0x3C6EF372,
    0xA54FF53A,
    0x510E527F,
    0x9B05688C,
    0x1F83D9AB,
    0x5BE0CD19,
)

MSG_PERMUTATION = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)

CHUNK_START = 1 << 0
CHUNK_END = 1 << 1
PARENT = 1 << 2
ROOT = 1 << 3

BLOCK_LEN = 64
CHUNK_LEN = 1024


def _rotr(x: int, r: int) -> int:
    return ((x >> r) | (x << (32 - r))) & _M32


def _compress(
    cv: tuple[int, ...] | list[int],
    block_words: list[int],
    counter: int,
    block_len: int,
    flags: int,
) -> list[int]:
    v = [
        cv[0], cv[1], cv[2], cv[3], cv[4], cv[5], cv[6], cv[7],
        IV[0], IV[1], IV[2], IV[3],
        counter & _M32, (counter >> 32) & _M32, block_len, flags,
    ]
    m = block_words

    def g(a: int, b: int, c: int, d: int, mx: int, my: int) -> None:
        v[a] = (v[a] + v[b] + mx) & _M32
        v[d] = _rotr(v[d] ^ v[a], 16)
        v[c] = (v[c] + v[d]) & _M32
        v[b] = _rotr(v[b] ^ v[c], 12)
        v[a] = (v[a] + v[b] + my) & _M32
        v[d] = _rotr(v[d] ^ v[a], 8)
        v[c] = (v[c] + v[d]) & _M32
        v[b] = _rotr(v[b] ^ v[c], 7)

    for r in range(7):
        g(0, 4, 8, 12, m[0], m[1])
        g(1, 5, 9, 13, m[2], m[3])
        g(2, 6, 10, 14, m[4], m[5])
        g(3, 7, 11, 15, m[6], m[7])
        g(0, 5, 10, 15, m[8], m[9])
        g(1, 6, 11, 12, m[10], m[11])
        g(2, 7, 8, 13, m[12], m[13])
        g(3, 4, 9, 14, m[14], m[15])
        if r != 6:
            m = [m[MSG_PERMUTATION[i]] for i in range(16)]

    return [
        v[0] ^ v[8], v[1] ^ v[9], v[2] ^ v[10], v[3] ^ v[11],
        v[4] ^ v[12], v[5] ^ v[13], v[6] ^ v[14], v[7] ^ v[15],
        v[8] ^ cv[0], v[9] ^ cv[1], v[10] ^ cv[2], v[11] ^ cv[3],
        v[12] ^ cv[4], v[13] ^ cv[5], v[14] ^ cv[6], v[15] ^ cv[7],
    ]


_words16 = struct.Struct("<16I").unpack


def _block_words(block: bytes) -> list[int]:
    if len(block) < BLOCK_LEN:
        block = block + b"\x00" * (BLOCK_LEN - len(block))
    return list(_words16(block))


def _chunk_output(
    chunk: bytes, chunk_counter: int
) -> tuple[list[int], list[int], int, int, int]:
    """Process all but the last block of a chunk; return the state needed to
    finalize: (cv, last_block_words, counter, last_block_len, base_flags)."""
    cv: list[int] | tuple[int, ...] = IV
    blocks = [chunk[i : i + BLOCK_LEN] for i in range(0, len(chunk), BLOCK_LEN)]
    if not blocks:
        blocks = [b""]
    for i, blk in enumerate(blocks[:-1]):
        flags = CHUNK_START if i == 0 else 0
        cv = _compress(cv, _block_words(blk), chunk_counter, BLOCK_LEN, flags)[:8]
    last = blocks[-1]
    flags = CHUNK_END | (CHUNK_START if len(blocks) == 1 else 0)
    return list(cv), _block_words(last), chunk_counter, len(last), flags


def _output_cv(state: tuple[list[int], list[int], int, int, int]) -> list[int]:
    cv, words, counter, blen, flags = state
    return _compress(cv, words, counter, blen, flags)[:8]


def _parent_state(
    left_cv: list[int], right_cv: list[int]
) -> tuple[list[int], list[int], int, int, int]:
    return (list(IV), left_cv + right_cv, 0, BLOCK_LEN, PARENT)


def blake3(data: bytes, out_len: int = 32) -> bytes:
    """One-shot BLAKE3 hash (hash mode, no key)."""
    # Split into chunks, build the binary tree via the CV stack discipline
    # from the reference implementation: after pushing chunk N's CV, merge
    # once for every trailing 1-bit... (total_chunks trailing zeros rule).
    n_chunks = max(1, (len(data) + CHUNK_LEN - 1) // CHUNK_LEN)
    if n_chunks == 1:
        root_state = _chunk_output(data, 0)
    else:
        # Completed chunks (all but the last) go through the trailing-zeros
        # push rule; the last chunk stays an *output node* so the ROOT flag
        # can be applied to it (or to the parents built above it).
        cv_stack: list[list[int]] = []
        for i in range(n_chunks - 1):
            chunk = data[i * CHUNK_LEN : (i + 1) * CHUNK_LEN]
            cv = _output_cv(_chunk_output(chunk, i))
            total = i + 1
            while total & 1 == 0:
                cv = _output_cv(_parent_state(cv_stack.pop(), cv))
                total >>= 1
            cv_stack.append(cv)
        root_state = _chunk_output(data[(n_chunks - 1) * CHUNK_LEN :], n_chunks - 1)
        while cv_stack:
            root_state = _parent_state(cv_stack.pop(), _output_cv(root_state))

    # Root output: XOF over the root node with ROOT flag
    cv, words, _counter, blen, flags = root_state
    out = bytearray()
    counter = 0
    while len(out) < out_len:
        full = _compress(cv, words, counter, blen, flags | ROOT)
        out += struct.pack("<16I", *full)
        counter += 1
    return bytes(out[:out_len])
