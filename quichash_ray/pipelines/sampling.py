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
