"""Exact-duplicate detection — the quichash ``dedup`` / ``analyze`` commands,
re-expressed as streaming Ray Data pipelines.

Reference semantics (/root/reference/src/dedup.rs:182-230, 599-629): hash every
file, group by digest, keep groups with >1 member, wasted = (count-1) * size
(equal digest ⇒ equal content ⇒ equal size, dedup.rs:610), paths sorted inside
a group, groups sorted by wasted desc. The reference folds everything into a
driver-resident ``HashMap<hash, Vec<(path,size)>>`` (dedup.rs:440-446) — here
that becomes a hash-partitioned ``groupby(digest)`` shuffle, which is the step
that scales across nodes; nothing is ever materialized on the driver.

Scale discipline: the fat ``content`` column is dropped before the shuffle
(only keys/digests/sizes move), and duplicate *groups* are emitted as
``(digest, cnt, size, wasted, rep)`` aggregate rows rather than materialized
path lists — a mega-group (empty files, LICENSE boilerplate) stays one row.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from quichash_ray.stages.digest import add_digests


def digest_table(
    ds: Dataset,
    content_col: str = "content",
    key_cols: tuple[str, ...] = ("path",),
    algorithm: str = "sha256",
    batch_size: int = 1024,
) -> Dataset:
    """content table → (key_cols..., digest, size); content projected away."""
    ds = add_digests(
        ds, [algorithm], content_col=content_col, drop_content=True,
        batch_size=batch_size, prefix_col="_dp",
    )

    def rename(b: pa.Table) -> pa.Table:
        b = b.rename_columns(
            [("digest" if c == algorithm else c) for c in b.column_names]
        )
        # _dp: int64 digest prefix emitted by the digest kernel — the
        # downstream banded aggregations partition on it without re-hashing
        # the hex string; it never appears in user-facing output
        keep = [*key_cols, "digest", "size", "_dp"]
        return b.select([c for c in keep if c in b.column_names])

    return ds.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def _banded_digest_agg(
    digests: Dataset, agg_fn, num_parts: int | None = None
) -> Dataset:
    """Partition by digest prefix (the int64 ``_dp`` column the digest
    kernel emits for free; crc32-of-hex fallback for external tables) then
    aggregate per partition with a vectorized pandas groupby — a digest
    never spans partitions, so the partition-local aggregate is globally
    exact. P derives from the input row count (~100B/row digest metadata);
    pass ``num_parts`` explicitly to keep a huge input streaming instead of
    counting it. Runs on the two-stage hash exchange (sort-free)."""
    import numpy as np

    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.partitioning import dataset_num_parts

    digests = digests.materialize()
    if num_parts is None:
        num_parts = dataset_num_parts(
            digests, bytes_per_row=100, target_bytes=32 << 20
        )
    P = num_parts

    def add_part(b: pa.Table) -> pa.Table:
        # rows with null digest (null content) are excluded from grouping —
        # the skip-and-count discipline
        b = b.filter(pa.compute.is_valid(b["digest"]))
        if "_dp" in b.column_names:
            dp = np.asarray(b["_dp"], dtype=np.int64).view(np.uint64)
            mult = np.uint64(0x9E3779B97F4A7C15)
            part = ((dp * mult) >> np.uint64(40)) % np.uint64(P)
            part = part.astype(np.int64)
            b = b.drop_columns(["_dp"])
        else:  # external digest table without the prefix column
            import zlib

            part = np.fromiter(
                (
                    zlib.crc32(d.encode()) % P
                    for d in b["digest"].to_pylist()
                ),
                np.int64,
                b.num_rows,
            )
        return b.append_column("part", pa.array(part))

    def agg_arrow(g: pa.Table) -> pa.Table:
        import pandas as pd

        if g.num_rows == 0:
            g = g  # agg_fn handles the empty frame
        return pa.Table.from_pandas(
            agg_fn(g.to_pandas()), preserve_index=False
        )

    return hash_exchange(
        digests.map_batches(
            add_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "part",
        agg_arrow,
        num_parts,
    )


def duplicate_groups(
    digests: Dataset,
    id_col: str = "path",
    size_col: str = "size",
) -> Dataset:
    """digest table → one row per duplicate group.

    Columns: ``digest, cnt, size, wasted, rep`` where ``rep`` is the minimal
    ``id_col`` value (the canonical representative — the reference sorts paths
    and keeps order, dedup.rs:612-613; at scale we keep only the minimum).
    """
    import pandas as pd

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("digest", sort=False)
            .agg(cnt=(id_col, "size"), size=(size_col, "min"), rep=(id_col, "min"))
            .reset_index()
        )
        out = out[out["cnt"] > 1]
        out["cnt"] = out["cnt"].astype("int64")
        out["size"] = out["size"].astype("int64")
        out["wasted"] = (out["cnt"] - 1) * out["size"]
        return out[["digest", "cnt", "size", "rep", "wasted"]]

    return _banded_digest_agg(digests, agg)


def dedup_keep_first(
    digests: Dataset,
    id_col: str = "path",
) -> Dataset:
    """Exact dedup: keep the minimal-``id_col`` row per digest (D1).

    "first" = min(id) per group, deterministic under any parallelism —
    the distributed analog of the reference's sorted-paths-first discipline.
    """
    import pandas as pd

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("digest", sort=False)[id_col].min().reset_index()
        )

    return _banded_digest_agg(digests, agg)


def grouped_dup_stats(
    digests: Dataset,
    group_col: str = "lang",
    size_col: str = "size",
) -> Dataset:
    """Per-``group_col`` dedup report over a digest table — the
    ``analyze`` semantics (analyze.rs:221-293) broken out by a metadata
    column (language, repo owner, license tier, ...), the per-slice
    report a training-data curator reads before choosing what to drop.

    → one row per group value: ``(group_col, total_files, total_bytes,
    unique_hashes, dup_groups, dup_files, wasted_bytes)`` with the same
    invariant ``unique_hashes = total_files - dup_files + dup_groups``
    per row.

    Dup groups are counted WITHIN a group value — the same digest
    appearing under two languages is one unique hash in each (the
    per-slice reading a curator wants; cross-slice overlap is
    :func:`duplicate_groups`' job).

    Scale shape: identical to :func:`analyze_stats` — one digest-prefix
    banded exchange; each partition reduces to per-group PARTIAL stat
    rows (exact, because a digest never spans partitions, so every
    (group, digest) dup group lives entirely inside one partition); the
    final rollup sums P × |group values| tiny partial rows, never
    corpus-sized data.
    """
    import pandas as pd

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        per = (
            g.groupby([group_col, "digest"], sort=False)
            .agg(cnt=("digest", "size"), sz=(size_col, "min"))
            .reset_index()
        )
        per["cnt"] = per["cnt"].astype("int64")
        per["sz"] = per["sz"].astype("int64")
        dup = per["cnt"] > 1
        out = pd.DataFrame(
            {
                group_col: per[group_col],
                "total_files": per["cnt"],
                "total_bytes": per["cnt"] * per["sz"],
                "unique_hashes": 1,
                "dup_groups": dup.astype("int64"),
                "dup_files": per["cnt"].where(dup, 0),
                "wasted_bytes": ((per["cnt"] - 1) * per["sz"]).where(dup, 0),
            }
        )
        return (
            out.groupby(group_col, sort=False, dropna=False)
            .sum()
            .reset_index()
        )

    partials = _banded_digest_agg(digests, agg)

    stat_cols = [
        "total_files",
        "total_bytes",
        "unique_hashes",
        "dup_groups",
        "dup_files",
        "wasted_bytes",
    ]

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(group_col, sort=False, dropna=False)[stat_cols].sum()
        return out.astype("int64").reset_index()

    # the partials table is tiny (P partitions × group cardinality);
    # Ray's native groupby is fine here — no banded exchange needed
    return partials.groupby(group_col).map_groups(
        rollup, batch_format="pandas"
    )


def per_algorithm_counts(db: Dataset) -> Dataset:
    """Per-algorithm and per-mode counts over a (legacy) digest DB —
    analyze.rs:239-256 semantics. → (algorithm, fast_mode, cnt)."""
    import pandas as pd

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["algorithm", "fast_mode"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        out["cnt"] = out["cnt"].astype("int64")
        return out

    def add_part(b: pa.Table) -> pa.Table:
        import zlib

        import numpy as np

        # 16 partitions is keyed to the ALGORITHM CATALOG cardinality
        # (hashes.py registers ~15 algorithms), not to data volume — the
        # group count can never exceed algorithms × 2 modes
        part = np.fromiter(
            (
                zlib.crc32(a.encode()) % 16
                for a in b["algorithm"].to_pylist()
            ),
            "int64",
            b.num_rows,
        )
        return b.append_column("part", pa.array(part))

    partials = (
        db.select_columns(["algorithm", "fast_mode"])
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby("part")
        .map_groups(agg, batch_format="pandas")
    )
    return partials


def analyze_stats(
    digests: Dataset,
    size_col: str = "size",
) -> Dataset:
    """Single-row corpus statistics (analyze.rs:221-293 semantics).

    Columns: total_files, total_bytes, unique_hashes, dup_groups, dup_files,
    wasted_bytes. Invariant (analyze.rs:262):
    ``unique_hashes = total_files - dup_files + dup_groups``.
    """
    import pandas as pd

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("digest", sort=False)
            .agg(cnt=("digest", "size"), size=(size_col, "min"))
            .reset_index()
        )
        out["cnt"] = out["cnt"].astype("int64")
        return out

    per_digest = _banded_digest_agg(digests, agg)

    def to_stats(b: pa.Table) -> pa.Table:
        cnt = b["cnt"]
        size = pc.cast(b["size"], pa.int64())
        dup_mask = pc.greater(cnt, 1)
        dup_cnt = pc.if_else(dup_mask, cnt, pa.scalar(0, cnt.type))
        wasted = pc.if_else(
            dup_mask,
            pc.multiply(pc.cast(pc.subtract(cnt, 1), pa.int64()), size),
            pa.scalar(0, pa.int64()),
        )
        return pa.table(
            {
                "groups": pa.array([b.num_rows], pa.int64()),
                "files": pa.array([pc.sum(cnt).as_py() or 0], pa.int64()),
                "bytes": pa.array(
                    [pc.sum(pc.multiply(pc.cast(cnt, pa.int64()), size)).as_py() or 0],
                    pa.int64(),
                ),
                "dup_groups": pa.array(
                    [pc.sum(pc.cast(dup_mask, pa.int64())).as_py() or 0], pa.int64()
                ),
                "dup_files": pa.array([pc.sum(dup_cnt).as_py() or 0], pa.int64()),
                "wasted_bytes": pa.array([pc.sum(wasted).as_py() or 0], pa.int64()),
            }
        )

    partials = per_digest.map_batches(to_stats, batch_format="pyarrow", batch_size=None)
    totals = partials.sum(
        ["groups", "files", "bytes", "dup_groups", "dup_files", "wasted_bytes"]
    )

    def final_row() -> pa.Table:
        return pa.table(
            {
                "total_files": pa.array([totals["sum(files)"]], pa.int64()),
                "total_bytes": pa.array([totals["sum(bytes)"]], pa.int64()),
                "unique_hashes": pa.array([totals["sum(groups)"]], pa.int64()),
                "dup_groups": pa.array([totals["sum(dup_groups)"]], pa.int64()),
                "dup_files": pa.array([totals["sum(dup_files)"]], pa.int64()),
                "wasted_bytes": pa.array([totals["sum(wasted_bytes)"]], pa.int64()),
            }
        )

    return final_row()


def dup_size_histogram(
    digests: Dataset,
    id_col: str = "path",
) -> Dataset:
    """Duplicate-cluster size distribution — how big dedup groups are
    (the capacity-planning / dedup-yield report): one row per group
    size with the number of groups and files at that size.
    → (cnt, n_groups, n_files).

    Shape: the audited banded digest exchange (a digest's rows land in
    one partition, so local per-digest counts are global), then a
    combiner over the size-histogram — the second shuffle carries
    (cnt, partial_n_groups) rows, bounded by distinct group sizes.
    Null digests (skip-and-count rows) are excluded, matching the
    oracle's WHERE digest IS NOT NULL.
    """
    import pandas as pd
    import pyarrow.compute as pc

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["digest"].notna()]
        if len(g) == 0:
            return pd.DataFrame(
                {"cnt": pd.Series([], dtype="int64"),
                 "n_groups": pd.Series([], dtype="int64")}
            )
        per = g.groupby("digest", sort=False)[id_col].size()
        vc = per.value_counts()
        return pd.DataFrame(
            {
                "cnt": vc.index.to_numpy().astype("int64"),
                "n_groups": vc.to_numpy().astype("int64"),
            }
        )

    partials = _banded_digest_agg(digests, agg)
    out = partials.groupby("cnt").sum("n_groups")

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(n_groups)" not in b.column_names:
            return pa.table(
                {
                    "cnt": pa.array([], pa.int64()),
                    "n_groups": pa.array([], pa.int64()),
                    "n_files": pa.array([], pa.int64()),
                }
            )
        cnt = pc.cast(b["cnt"], pa.int64())
        ng = pc.cast(b["sum(n_groups)"], pa.int64())
        return pa.table(
            {
                "cnt": cnt,
                "n_groups": ng,
                "n_files": pc.multiply(cnt, ng),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)
