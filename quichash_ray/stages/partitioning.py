"""Scale-aware partition counts for banded shuffles.

Every banded ``groupby(part).map_groups`` in this engine materializes one
partition per task as a single in-memory table, so the partition count must
grow with the input: a fixed P means partitions of N/P rows — tens of GB per
task at 100× data. ``choose_num_parts`` derives P from the row count and an
estimated row width so each group lands near ``target_bytes`` (default
64 MB — comfortably inside a worker heap, large enough to amortize per-group
Python overhead).

Callers that already know their dataset's row count pass it directly;
callers holding a lazy Dataset use :func:`dataset_num_parts`, which relies
on Ray's metadata-backed ``count()`` fast path for Parquet reads and
materialized datasets.
"""

from __future__ import annotations

MIN_PARTS = 8
MAX_PARTS = 65536


def choose_num_parts(
    n_rows: int,
    bytes_per_row: int = 64,
    target_bytes: int = 64 << 20,
    min_parts: int = MIN_PARTS,
    max_parts: int = MAX_PARTS,
) -> int:
    """Partition count so that n_rows × bytes_per_row / P ≈ target_bytes."""
    if n_rows <= 0:
        return min_parts
    p = (n_rows * bytes_per_row + target_bytes - 1) // target_bytes
    return int(min(max(p, min_parts), max_parts))


def string_hash_impl() -> str:
    """Pick the string-hash implementation ONCE, on the driver, at
    stage-build time. ``key_part_column`` re-deciding per worker via
    try/except would silently break the all-rows-of-a-key-in-one-partition
    guarantee if worker environments were ever heterogeneous (or polars
    changed its hash mid-job): same key, different partition. Callers whose
    kernels hash string keys capture this value in the closure and pass it
    as ``impl=``."""
    try:
        import polars  # noqa: F401

        return "polars"
    except ImportError:
        return "crc32"


def key_part_column(col, num_parts: int, impl: str | None = None):
    """Vectorized stable hash-partition assignment for an int or string key
    column → int64 pyarrow array of parts in [0, num_parts).

    Integers take a splitmix-style scramble (sequential ids spread evenly);
    strings take polars' vectorized xxhash (67× the per-row crc32 loop at
    1M keys) or the zlib crc32 loop, per ``impl`` — which MUST come from a
    driver-side :func:`string_hash_impl` call when this runs inside a
    worker kernel (see that docstring). Nulls land in part 0. The value is
    only ever a partition ASSIGNMENT — it never appears in output — so the
    only requirement is within-job consistency.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(arr.type):
        vals = np.asarray(arr.cast(pa.int64()))
        with np.errstate(invalid="ignore"):
            h = (
                vals.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ) >> np.uint64(33)
        parts = (h % np.uint64(num_parts)).astype(np.int64)
    else:
        if not (
            pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
        ):
            arr = pc.cast(arr, pa.string())
        if impl is None:
            impl = string_hash_impl()
        if impl == "polars":
            import polars as pl

            h = pl.from_arrow(arr).hash(seed=0)
            parts = (
                np.asarray(h.to_numpy(), dtype=np.uint64)
                % np.uint64(num_parts)
            ).astype(np.int64)
        else:
            import zlib

            parts = np.fromiter(
                (
                    zlib.crc32(v.encode("utf-8")) % num_parts
                    if v is not None
                    else 0
                    for v in arr.to_pylist()
                ),
                dtype=np.int64,
                count=len(arr),
            )
    if arr.null_count:
        parts[np.asarray(pc.is_null(arr))] = 0
    return pa.array(parts, pa.int64())


def dataset_num_parts(
    ds,
    bytes_per_row: int = 64,
    target_bytes: int = 64 << 20,
    min_parts: int = MIN_PARTS,
    max_parts: int = MAX_PARTS,
) -> int:
    """choose_num_parts from a Dataset's (cheap) count."""
    return choose_num_parts(
        ds.count(), bytes_per_row, target_bytes, min_parts, max_parts
    )
