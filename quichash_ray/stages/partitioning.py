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
