"""Chunk-granularity dedup — the storage-style sub-file tier: split every
document into fixed ``chunk_chars``-character chunks, digest each, and
reuse the audited exact-dedup machinery over the CHUNK digest table.

This is the reference's hashing discipline applied one level below the
file (analyze.rs semantics over chunks instead of files): two documents
that share paragraphs but differ elsewhere contribute duplicate CHUNKS
even though their file digests differ — the dedup-ratio signal a
storage/dedup system (or a near-dup triage pass) reads before paying for
MinHash. Fixed-size chunking is exactly SQL-mirrorable (``substr`` every
C characters), which keeps the operator hash-exact under the DuckDB
oracle; content-defined (gear/rabin) boundaries are the scale extension
and would slot into the same chunk-table shape.

Scale shape: one streaming pass expands (id, text) → (digest, size, _dp)
chunk rows (content dropped, ~40 B/chunk metadata), then
``dedup.analyze_stats`` runs its banded digest exchange — nothing new to
audit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def chunk_digest_table(
    ds: Dataset,
    chunk_chars: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """→ (chunk_id, digest, size, _dp): sha256 per fixed-size chunk.
    ``size`` is the chunk's UTF-8 byte length (strlen in the oracle);
    ``_dp`` is the int64 digest prefix the banded exchanges partition on
    (same contract as the file-digest kernel). Null/empty docs yield no
    chunks."""
    if chunk_chars <= 0:
        raise ValueError(f"chunk_chars must be positive, got {chunk_chars}")

    def kernel(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        out_id, out_dig, out_size = [], [], []
        for rid, txt in zip(ids, texts):
            if not txt:
                continue
            for ci, s in enumerate(range(0, len(txt), chunk_chars)):
                chunk = txt[s : s + chunk_chars].encode("utf-8")
                out_id.append(f"{rid}:{ci}")
                out_dig.append(hashlib.sha256(chunk).hexdigest())
                out_size.append(len(chunk))
        if not out_dig:
            return pa.table(
                {
                    "chunk_id": pa.array([], pa.string()),
                    "digest": pa.array([], pa.string()),
                    "size": pa.array([], pa.int64()),
                    "_dp": pa.array([], pa.int64()),
                }
            )
        raw = np.frombuffer(
            bytes.fromhex("".join(d[:16] for d in out_dig)), np.uint8
        ).reshape(-1, 8)
        dp = np.ascontiguousarray(raw).view(np.uint64).reshape(-1)
        return pa.table(
            {
                "chunk_id": pa.array(out_id, pa.string()),
                "digest": pa.array(out_dig, pa.string()),
                "size": pa.array(out_size, pa.int64()),
                "_dp": pa.array(dp.astype(np.int64)),
            }
        )

    return ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


# deterministic gear table: 256 uint64 words derived from sha256 of the
# byte value — no RNG, identical on every worker
def _gear_table() -> np.ndarray:
    out = np.empty(256, np.uint64)
    for i in range(256):
        out[i] = int.from_bytes(
            hashlib.sha256(bytes([i])).digest()[:8], "big"
        )
    return out


_GEAR = _gear_table()


def gear_boundaries(data: bytes, mask_bits: int = 6) -> np.ndarray:
    """Content-defined cut points (gear rolling hash, LBFS/FastCDC
    family): cut after position t when gear_hash(t) has its HIGH
    ``mask_bits`` bits zero → expected chunk ≈ 2^mask_bits bytes. The
    high bits are used because gear's low bits have only ``mask_bits``
    bytes of memory and skew on small-alphabet text — the same reason
    FastCDC spreads its mask toward the high end of the word.

    The gear hash has a 64-byte memory (h_t = Σ_{j<64} GEAR[b_{t−j}]≪j,
    old bytes shift out), so boundaries depend only on a 64-byte window —
    the property that makes chunking INSERTION-ROBUST: content after an
    edit re-synchronizes within one window, unlike fixed-size chunks
    where one inserted byte shifts every later chunk. The finite memory
    also makes it fully VECTORIZABLE: 64 shifted table-lookup adds over
    the whole byte array, no per-byte Python loop.

    Returns the sorted cut positions (exclusive ends), always including
    len(data)."""
    b = np.frombuffer(data, np.uint8)
    n = len(b)
    if n == 0:
        return np.zeros(1, np.int64)
    h = np.zeros(n, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(min(64, n)):
            h[j:] += _GEAR[b[: n - j]] << np.uint64(j)
    cuts = np.flatnonzero((h >> np.uint64(64 - mask_bits)) == 0) + 1
    if len(cuts) == 0 or cuts[-1] != n:
        cuts = np.concatenate((cuts, [n]))
    return cuts.astype(np.int64)


def cdc_chunk_digest_table(
    ds: Dataset,
    mask_bits: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """→ (chunk_id, digest, size, _dp): sha256 per CONTENT-DEFINED chunk
    (gear boundaries over the UTF-8 bytes). Same schema as
    :func:`chunk_digest_table`, so the same analyze machinery consumes
    it; no SQL oracle (a rolling gear hash is not SQL-expressible) — the
    insertion-robustness property is pytest-gated instead."""

    def kernel(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        out_id, out_dig, out_size = [], [], []
        for rid, txt in zip(ids, texts):
            if not txt:
                continue
            data = txt.encode("utf-8")
            cuts = gear_boundaries(data, mask_bits)
            start = 0
            for ci, end in enumerate(cuts):
                chunk = data[start:end]
                out_id.append(f"{rid}:{ci}")
                out_dig.append(hashlib.sha256(chunk).hexdigest())
                out_size.append(len(chunk))
                start = end
        if not out_dig:
            return pa.table(
                {
                    "chunk_id": pa.array([], pa.string()),
                    "digest": pa.array([], pa.string()),
                    "size": pa.array([], pa.int64()),
                    "_dp": pa.array([], pa.int64()),
                }
            )
        raw = np.frombuffer(
            bytes.fromhex("".join(d[:16] for d in out_dig)), np.uint8
        ).reshape(-1, 8)
        dp = np.ascontiguousarray(raw).view(np.uint64).reshape(-1)
        return pa.table(
            {
                "chunk_id": pa.array(out_id, pa.string()),
                "digest": pa.array(out_dig, pa.string()),
                "size": pa.array(out_size, pa.int64()),
                "_dp": pa.array(dp.astype(np.int64)),
            }
        )

    return ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def cdc_dedup_stats(
    ds: Dataset,
    mask_bits: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """analyze semantics over content-defined chunks — the dedup ratio
    that survives insertions/prefix shifts (rows-only; gear hash is not
    SQL-expressible)."""
    from quichash_ray.pipelines.dedup import analyze_stats

    return analyze_stats(
        cdc_chunk_digest_table(ds, mask_bits, text_col, id_col)
    )


def chunk_dedup_stats(
    ds: Dataset,
    chunk_chars: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """One-row chunk-level corpus stats — ``analyze_stats`` semantics
    over the chunk digest table: total_files (= chunks), total_bytes,
    unique_hashes, dup_groups, dup_files, wasted_bytes. The
    unique = total − dup + groups invariant holds per construction."""
    from quichash_ray.pipelines.dedup import analyze_stats

    return analyze_stats(
        chunk_digest_table(ds, chunk_chars, text_col, id_col)
    )
