"""Vectorized tokenizer + shingle hashing over raw Arrow UTF-8 buffers.

Replicates ``gram_hashes(text.split(), k)`` (ngram.py) for a whole Arrow
string column without materializing a single Python string: token
boundaries come from a whitespace lookup table over the column's UTF-8 data
buffer, per-token CRC-32s from a table-driven update vectorized across all
tokens of the batch (length-sorted so each byte-position step is a
contiguous slice), and k-gram polynomial hashes from shifted views of the
flat token-hash array masked at document boundaries.

Semantics note: token boundaries are runs of non-ASCII-whitespace bytes
(space, \\t, \\n, \\r, \\f, \\v) — identical to ``str.split()`` for ASCII
text. ``str.split()`` additionally splits on *Unicode* whitespace
(U+00A0, U+2028, …); such bytes are vanishingly rare in source code and a
document containing them merely yields a slightly different shingle set
through both signature and verification paths (both use this kernel).

Status: an AVAILABLE alternative kernel, equivalence-tested but NOT wired
into the production paths — measured on the synthetic (Zipfian-vocabulary)
corpus, the memoized per-row path (``split`` + dict-cached ``zlib.crc32``)
is faster because token cache hits dominate; this kernel wins when the
vocabulary is large enough to defeat the memo (see NOTES_r2.md). Swap it
into ``SignatureActor``/``make_shingle_recompute_fn`` behind the same
(flat, offsets) contract when profiling shows tokenization dominating.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# CRC-32 (IEEE 802.3, reflected, poly 0xEDB88320) — the zlib.crc32 function
_POLY = np.uint32(0xEDB88320)


def _build_table() -> np.ndarray:
    table = np.empty(256, dtype=np.uint32)
    for i in range(256):
        c = np.uint32(i)
        for _ in range(8):
            c = (c >> np.uint32(1)) ^ (_POLY if c & np.uint32(1) else np.uint32(0))
        table[i] = c
    return table


_CRC_TABLE = _build_table()

_WS_LUT = np.zeros(256, dtype=bool)
for _b in (0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20):
    _WS_LUT[_b] = True

_GRAM_P = np.uint64(1099511628211)  # must match ngram._P


def crc32_tokens(
    buf: np.ndarray, starts: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """CRC-32 of each token (byte runs of ``buf``), vectorized.

    Tokens are processed length-sorted so the per-byte-position update is a
    contiguous numpy slice; total work is O(sum(lens))."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    order = np.argsort(lens, kind="stable")
    s_starts = starts[order]
    s_lens = lens[order]
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    max_len = int(s_lens[-1])
    for j in range(max_len):
        k0 = int(np.searchsorted(s_lens, j, side="right"))
        idx = s_starts[k0:] + j
        byte = buf[idx].astype(np.uint32)
        c = crc[k0:]
        crc[k0:] = (c >> np.uint32(8)) ^ _CRC_TABLE[(c ^ byte) & np.uint32(0xFF)]
    crc ^= np.uint32(0xFFFFFFFF)
    out = np.empty(n, dtype=np.uint32)
    out[order] = crc
    return out


def _string_col_buffers(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Arrow (large_)string column → (uint8 data, int64 value offsets,
    bool validity) as numpy views (zero-copy)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type):
        col = col.cast(pa.large_string())
    off = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset : col.offset + len(col) + 1
    ]
    data_buf = col.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, np.uint8)
    )
    if col.null_count:
        valid = np.asarray(col.is_valid())
    else:
        valid = np.ones(len(col), dtype=bool)
    return data, off, valid


def batch_gram_hashes(
    col, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """String column → (flat uint64 shingle hashes, int64 element offsets,
    bool validity).

    Per document: the sorted distinct 64-bit polynomial hashes of its
    k-token shingles — element i of the column owns
    ``flat[offsets[i]:offsets[i+1]]``. Null documents contribute zero
    elements (and ``validity[i]`` is False so callers can skip them).
    Exactly equals ``ngram.gram_hashes(text.split(), k)`` per row for
    ASCII-whitespace text.
    """
    buf, doc_off, valid = _string_col_buffers(col)
    n_docs = len(doc_off) - 1
    if n_docs == 0 or len(buf) == 0:
        return (
            np.empty(0, np.uint64),
            np.zeros(n_docs + 1, np.int64),
            valid,
        )
    lo, hi = doc_off[0], doc_off[-1]
    win = buf[lo:hi]
    if len(win) == 0:  # sliced window covering only empty/null docs
        return (
            np.empty(0, np.uint64),
            np.zeros(n_docs + 1, np.int64),
            valid,
        )
    is_ws = _WS_LUT[win]
    nonws = ~is_ws
    # token starts/ends, with forced breaks at document boundaries (the
    # data buffer concatenates documents with no separator)
    prev_ws = np.empty_like(is_ws)
    prev_ws[0] = True
    prev_ws[1:] = is_ws[:-1]
    next_ws = np.empty_like(is_ws)
    next_ws[-1] = True
    next_ws[:-1] = is_ws[1:]
    start_flag = nonws & prev_ws
    end_flag = nonws & next_ws
    bounds = doc_off[1:-1] - lo  # interior document boundaries
    if len(bounds):
        inb = bounds[(bounds > 0) & (bounds < len(win))]
        start_flag[inb] |= nonws[inb]
        prev = inb - 1
        end_flag[prev] |= nonws[prev]
    tok_starts = np.flatnonzero(start_flag).astype(np.int64)
    tok_ends = np.flatnonzero(end_flag).astype(np.int64) + 1
    n_tok = len(tok_starts)
    if n_tok == 0:
        return (
            np.empty(0, np.uint64),
            np.zeros(n_docs + 1, np.int64),
            valid,
        )
    tok_lens = tok_ends - tok_starts
    # token → document assignment (doc_off right-exclusive)
    tok_doc = (
        np.searchsorted(doc_off, tok_starts + lo, side="right") - 1
    ).astype(np.int64)
    crcs = crc32_tokens(win, tok_starts, tok_lens).astype(np.uint64)
    # k-gram polynomial hash over shifted views, masked at doc boundaries
    if n_tok < k:
        return (
            np.empty(0, np.uint64),
            np.zeros(n_docs + 1, np.int64),
            valid,
        )
    m = n_tok - k + 1
    with np.errstate(over="ignore"):
        h = crcs[:m].copy()
        for j in range(1, k):
            h = h * _GRAM_P + crcs[j : m + j]
    same_doc = tok_doc[:m] == tok_doc[k - 1 :]
    h = h[same_doc]
    g_doc = tok_doc[:m][same_doc]
    # per-doc sorted distinct
    order = np.lexsort((h, g_doc))
    h = h[order]
    g_doc = g_doc[order]
    if len(h):
        keep = np.empty(len(h), dtype=bool)
        keep[0] = True
        keep[1:] = (h[1:] != h[:-1]) | (g_doc[1:] != g_doc[:-1])
        h = h[keep]
        g_doc = g_doc[keep]
    counts = np.bincount(g_doc, minlength=n_docs).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    return h, offsets, valid
