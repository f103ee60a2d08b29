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
