"""Digest stage — stateless ``map_batches`` kernels over zero-copy Arrow.

The exact-dup core (north_star): per-row content digests computed inside
``Dataset.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)``.
Replaces the reference's walker→channel→rayon pipeline
(/root/reference/src/scan.rs:290-526) — Ray Data's streaming executor provides
the discovery/hash overlap and backpressure for free.

The content column is cast ``large_string → large_binary`` (zero-copy; same
Arrow buffers) before hashing so digests are over the UTF-8 bytes, matching
``compute_hash_text`` (/root/reference/src/hash.rs:489-545). The per-row loop
calls hashlib's C kernels — the per-row cost is the digest itself, which is
the irreducible work.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa
import pyarrow.compute as pc

from quichash_ray.functions.fastmode import fast_sample
from quichash_ray.functions.hashes import canonical_name, get_digest_fn


def content_byte_views(
    batch: pa.Table, content_col: str
) -> tuple[list[memoryview | None], pa.Array]:
    """Content column → per-row ``memoryview``s over the Arrow data buffer —
    zero-copy (the old ``to_pylist()`` duplicated every content buffer into
    Python bytes before hashing; hashlib consumes memoryviews directly).
    Public: decontamination/fingerprint key emission reuses this shape."""
    import numpy as np

    col = batch[content_col]
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        col = pc.cast(col, pa.large_binary())
    combined = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_binary(combined.type):
        combined = combined.cast(pa.large_binary())
    sizes = pc.binary_length(combined)
    n = len(combined)
    if n == 0:
        return [], sizes
    off = np.frombuffer(combined.buffers()[1], dtype=np.int64)[
        combined.offset : combined.offset + n + 1
    ]
    data_buf = combined.buffers()[2]
    mv = memoryview(data_buf) if data_buf is not None else memoryview(b"")
    if combined.null_count:
        valid = np.asarray(combined.is_valid())
    else:
        valid = None
    views: list[memoryview | None] = [
        mv[off[i] : off[i + 1]]
        if (valid is None or valid[i])
        else None
        for i in range(n)
    ]
    return views, sizes


def make_digest_kernel(
    algorithms: Iterable[str] = ("sha256",),
    content_col: str = "content",
    fast_mode: bool = False,
    fast_sample_size: int = 100 * 1024 * 1024,
    add_size: bool = True,
    drop_content: bool = False,
    prefix_col: str | None = None,
):
    """Build a ``pa.Table -> pa.Table`` kernel adding one hex-digest column per
    algorithm (column named by canonical algorithm name), plus ``size`` (bytes).

    Multi-algorithm single-pass semantics (hash.rs:802-911): one traversal of
    the content feeds every requested hasher. ``fast_mode`` applies the sampled
    projection (hash.rs:977-1066) before digesting. ``drop_content`` projects
    the fat column away immediately after hashing — wide-record discipline for
    every downstream shuffle.
    """
    algos = [canonical_name(a) for a in algorithms]
    fns = [(a, get_digest_fn(a)) for a in algos]

    def kernel(batch: pa.Table) -> pa.Table:
        data, sizes = content_byte_views(batch, content_col)
        if fast_mode:
            data = [
                None if d is None else fast_sample(d, fast_sample_size)
                for d in data
            ]
        for algo_i, (name, fn) in enumerate(fns):
            raws = [None if d is None else fn(d) for d in data]
            batch = batch.append_column(
                name,
                pa.array(
                    [None if r is None else r.hex() for r in raws], pa.string()
                ),
            )
            if prefix_col is not None and algo_i == 0:
                # first 8 digest bytes as int64 — a uniform partition key
                # downstream shuffles use without re-hashing the hex string
                batch = batch.append_column(
                    prefix_col,
                    pa.array(
                        [
                            None
                            if r is None
                            else int.from_bytes(r[:8], "big") - (1 << 63)
                            for r in raws
                        ],
                        pa.int64(),
                    ),
                )
        if add_size and "size" not in batch.column_names:
            batch = batch.append_column("size", pc.cast(sizes, pa.int64()))
        if fast_mode and "fast_mode" not in batch.column_names:
            # part of DB semantics (database.rs:140): record the mode used
            batch = batch.append_column(
                "fast_mode", pa.array([True] * batch.num_rows, pa.bool_())
            )
        if drop_content:
            batch = batch.drop_columns([content_col])
        return batch

    return kernel


def add_digests(
    ds,
    algorithms: Iterable[str] = ("sha256",),
    content_col: str = "content",
    fast_mode: bool = False,
    fast_sample_size: int = 100 * 1024 * 1024,
    drop_content: bool = False,
    batch_size: int = 1024,
    prefix_col: str | None = None,
):
    """``Dataset -> Dataset`` with digest columns appended (streaming)."""
    return ds.map_batches(
        make_digest_kernel(
            algorithms,
            content_col,
            fast_mode,
            fast_sample_size,
            drop_content=drop_content,
            prefix_col=prefix_col,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


# back-compat alias (pre-round-4 private name)
_content_bytes = content_byte_views
