"""Deterministic sampling operators for training-data curation.

Random sampling in a distributed engine must be DETERMINISTIC to be
resumable and auditable (a re-run after a failure must keep the same
rows), so both operators key on the md5 of the row id — stable across
runs, machines, and partitionings — never on an RNG:

- :func:`hash_sample` — Bernoulli sample at a basis-point rate: keep a row
  iff the first 8 hex chars of ``md5(str(id))`` compare below the rate
  threshold (lowercase-hex string order == numeric order, so the engine
  and the DuckDB oracle agree bit-for-bit with zero float arithmetic).
  One streaming pass, zero shuffles.

- :func:`cap_per_group` — MassiveText-style per-source capping: keep at
  most ``k`` rows per group, chosen by (md5(id), id) order — an unbiased,
  reproducible per-group subsample. One hash exchange on the group key
  carrying only (id, group, sample key) — content never rides the
  shuffle; re-attach payloads downstream by id join if needed.

Reference analog: none (quichash is a hashing tool); graft-mandate
curation ops. Oracles in ``__ray_entry__.oracle_sql()`` mirror both rules
literally (DuckDB ``md5()`` + ``QUALIFY row_number()``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from quichash_ray.stages.exchange import hash_exchange
from quichash_ray.stages.partitioning import (
    dataset_num_parts,
    key_part_column,
    string_hash_impl,
)


def _md5_hex(ids: list) -> list[str]:
    return [
        hashlib.md5(str(i).encode("utf-8")).hexdigest() for i in ids
    ]


def hash_sample(
    ds: Dataset, rate_bp: int, id_col: str = "doc_id"
) -> Dataset:
    """Keep rows whose md5(id) 8-hex-char prefix < rate_bp/10000 of the
    32-bit space. Emits the input columns unchanged."""
    threshold = format((int(rate_bp) * (1 << 32)) // 10000, "08x")

    def kernel(b: pa.Table) -> pa.Table:
        pfx = [h[:8] for h in _md5_hex(b[id_col].to_pylist())]
        mask = pa.array([p < threshold for p in pfx], pa.bool_())
        return b.filter(mask)

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def cap_per_group(
    ds: Dataset,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> Dataset:
    """→ (id_col, group_col, rnk) for the ≤k kept rows per group, ranked by
    (md5(id), id). Only the two key columns ride the exchange."""
    if num_parts is None:
        num_parts = dataset_num_parts(
            ds, bytes_per_row=48, target_bytes=32 << 20
        )
    # hash impl pinned on the driver so heterogeneous workers can't route
    # the same group key to different partitions (see string_hash_impl)
    hash_impl = string_hash_impl()

    def tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b[id_col],
                group_col: b[group_col],
                "skey": pa.array(
                    _md5_hex(b[id_col].to_pylist()), pa.string()
                ),
                "part": key_part_column(
                    b[group_col], num_parts, impl=hash_impl
                ),
            }
        )

    def topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    group_col: pa.array([], pa.string()),
                    "rnk": pa.array([], pa.int64()),
                }
            )
        df = g.to_pandas().sort_values([group_col, "skey", id_col])
        df["rnk"] = df.groupby(group_col, sort=False).cumcount() + 1
        kept = df[df["rnk"] <= k]
        return pa.Table.from_pandas(
            kept[[id_col, group_col, "rnk"]].astype({"rnk": "int64"}),
            preserve_index=False,
        )

    return hash_exchange(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "part",
        topk,
        num_parts,
    )


def mix_to_weights(
    ds: Dataset,
    weights_bp: dict[str, int],
    group_col: str = "source",
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> Dataset:
    """Deterministic source-mixing sampler: down-sample so the kept rows
    follow the target mix ``weights_bp`` (basis points per group) while
    keeping the maximum possible data — the domain-mixture step of a
    training-data pipeline (e.g. web 50% / books 30% / code 20%).

    Integer-exact sizing, mirrored by the SQL oracle: with per-group
    counts c_g, ``scale = min_g (c_g * 10000) // w_g`` over the weighted
    groups present in the corpus, and each group keeps its first
    ``k_g = (scale * w_g) // 10000`` rows by (md5(id), id) order — the
    same deterministic, resume-stable ranking as :func:`cap_per_group`.
    Groups not in ``weights_bp`` are dropped; weighted groups absent
    from the corpus are ignored (inner-join semantics).

    → (id_col, group_col, rnk) with rnk ≤ k_g. Shape: one small
    groupby-count (group-cardinality-sized — driver-safe), then one
    group-key hash exchange carrying only (id, group, sample-key) rows.
    """
    counts = ds.groupby(group_col).count()
    k_by_group: dict[str, int] = {}
    scale = None
    rows = counts.take_all()  # bounded by the number of groups
    for r in rows:
        g = r[group_col]
        w = weights_bp.get(g)
        if w:
            s = (int(r["count()"]) * 10000) // int(w)
            scale = s if scale is None else min(scale, s)
    if scale is not None:
        for g, w in weights_bp.items():
            k_by_group[g] = (scale * int(w)) // 10000

    if num_parts is None:
        num_parts = dataset_num_parts(
            ds, bytes_per_row=48, target_bytes=32 << 20
        )
    hash_impl = string_hash_impl()

    def tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b[id_col],
                group_col: b[group_col],
                "skey": pa.array(
                    _md5_hex(b[id_col].to_pylist()), pa.string()
                ),
                "part": key_part_column(
                    b[group_col], num_parts, impl=hash_impl
                ),
            }
        )

    def topk(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                group_col: pa.array([], pa.string()),
                "rnk": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0 or "skey" not in g.column_names:
            return empty
        df = g.to_pandas().sort_values([group_col, "skey", id_col])
        df["k_g"] = df[group_col].map(k_by_group).fillna(0).astype("int64")
        df["rnk"] = df.groupby(group_col, sort=False).cumcount() + 1
        kept = df[df["rnk"] <= df["k_g"]]
        if len(kept) == 0:
            return empty
        return pa.Table.from_pandas(
            kept[[id_col, group_col, "rnk"]].astype({"rnk": "int64"}),
            preserve_index=False,
        )

    return hash_exchange(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "part",
        topk,
        num_parts,
    )


def hash_split(
    ds: Dataset,
    splits: list[tuple[str, int]],
    id_col: str = "doc_id",
) -> Dataset:
    """Deterministic train/val/test assignment: route each row to a named
    split by where its md5(id) 8-hex-char prefix falls among cumulative
    basis-point thresholds (``splits`` = ordered (name, bp) pairs summing
    to 10000). The same id lands in the same split on every run, machine,
    and partitioning — the resume/audit-safe alternative to
    ``Dataset.train_test_split``'s RNG. One streaming pass, zero
    shuffles; emits the input columns plus ``split``.

    Threshold rule shared with :func:`hash_sample` (and mirrored by the
    SQL oracle): cumulative bp c maps to hex((c * 2^32) // 10000); a
    lowercase-hex string compare equals the numeric compare.
    """
    if sum(bp for _, bp in splits) != 10000:
        raise ValueError("split basis points must sum to 10000")
    names: list[str] = []
    bounds: list[int] = []
    cum = 0
    for name, bp in splits:
        cum += int(bp)
        names.append(name)
        bounds.append((cum * (1 << 32)) // 10000)
    np_bounds = np.array(bounds[:-1], dtype=np.uint64)  # last bucket catches all
    np_names = np.array(names)

    def kernel(b: pa.Table) -> pa.Table:
        vals = np.array(
            [int(h[:8], 16) for h in _md5_hex(b[id_col].to_pylist())],
            dtype=np.uint64,
        )
        idx = np.searchsorted(np_bounds, vals, side="right")
        return b.append_column("split", pa.array(np_names[idx], pa.string()))

    return ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def top_per_group(
    ds: Dataset,
    k: int,
    score_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> Dataset:
    """Ranked per-group selection: keep the ``k`` BEST rows per group by
    (score DESC, id ASC) — the quality-stratified curation step (vs
    :func:`cap_per_group`, which subsamples uniformly by hash).
    → (id_col, group_col, score_col, rnk) with rnk ≤ k. One group-key
    hash exchange carrying (id, group, score) rows only.
    """
    if num_parts is None:
        num_parts = dataset_num_parts(
            ds, bytes_per_row=48, target_bytes=32 << 20
        )
    hash_impl = string_hash_impl()

    def tag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                id_col: b[id_col],
                group_col: b[group_col],
                score_col: pc.cast(b[score_col], pa.int64()),
                "part": key_part_column(
                    b[group_col], num_parts, impl=hash_impl
                ),
            }
        )

    def topk(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                group_col: pa.array([], pa.string()),
                score_col: pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0 or score_col not in g.column_names:
            return empty
        df = g.to_pandas().sort_values(
            [group_col, score_col, id_col],
            ascending=[True, False, True],
        )
        df["rnk"] = df.groupby(group_col, sort=False).cumcount() + 1
        kept = df[df["rnk"] <= k]
        if len(kept) == 0:
            return empty
        return pa.Table.from_pandas(
            kept[[id_col, group_col, score_col, "rnk"]].astype(
                {"rnk": "int64", score_col: "int64"}
            ),
            preserve_index=False,
        )

    return hash_exchange(
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "part",
        topk,
        num_parts,
    )
