"""Distributed candidate-pair verification — two-tier, broadcast-free.

Verifying LSH candidates needs per-document data (signatures / shingle sets)
on both sides of each pair. Broadcasting a corpus-wide lookup scales with the
corpus; this stage instead **co-partitions pairs with the per-doc data by
hash(key) % P** — the classic repartition-join expressed as one Ray Data
groupby per side, all data volumes proportional to the candidate set.

Tier 1 (cheap, minhash): estimated Jaccard = fraction of equal signature
components. With 128 permutations, σ ≈ sqrt(J(1-J)/128) ≈ 0.04, so:
  est ≥ thr + margin  → accept outright
  est <  thr − margin → reject outright
  otherwise           → borderline, go to tier 2
Tier 2 (exact, shingles): attach the true shingle sets to the (few)
borderline pairs the same co-partitioned way and compute exact Jaccard.

Result ≡ exact verification for every pair whose true Jaccard is outside
[thr−margin′, thr+margin′] with overwhelming probability; borderline pairs
are decided exactly. Deterministic given the MinHash seed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from quichash_ray.config import FuzzyConfig

_MULT = np.uint64(0x9E3779B97F4A7C15)


def _flat_lists(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = np.asarray(col.values, dtype=np.int64)
    if pa.types.is_fixed_size_list(col.type):
        w = col.type.list_size
        offs = np.arange(len(col) + 1, dtype=np.int64) * w
    else:
        offs = np.asarray(col.offsets, dtype=np.int64)
    return vals, offs


def _attach_side(
    pairs: Dataset,
    data: Dataset,
    side: str,
    id_col: str,
    data_col: str,
    out_col: str,
    num_parts: int,
) -> Dataset:
    """pairs ⟕ data(id → list column) on ``side`` via co-partitioned groupby.

    ``pairs`` may carry prior list columns (they ride through the shuffle).
    Rows whose key has no data row are dropped (inner-join semantics — a
    candidate id always has a signature row by construction).
    """
    pair_names = [n for n in pairs.schema().names]

    data_type = data.schema().base_schema.field(data_col).type if hasattr(
        data.schema(), "base_schema"
    ) else pa.list_(pa.int64())

    def pairs_part(b: pa.Table) -> pa.Table:
        key = np.asarray(b[side], dtype=np.int64).view(np.uint64)
        part = ((key * _MULT) >> np.uint64(40)) % np.uint64(num_parts)
        b = b.append_column("_kind", pa.array(np.ones(b.num_rows, np.int8)))
        if data_col not in b.column_names:
            b = b.append_column(
                data_col, pa.nulls(b.num_rows, data_type)
            )
        return b.append_column("_part", pa.array(part.astype(np.int64)))

    pair_types = list(pairs.schema().types)

    def data_part(b: pa.Table) -> pa.Table:
        key = np.asarray(b[id_col], dtype=np.int64).view(np.uint64)
        part = ((key * _MULT) >> np.uint64(40)) % np.uint64(num_parts)
        # a pairs-shaped shell row per data row, key in `side`, rest null
        cols = {}
        for i, n in enumerate(pair_names):
            cols[n] = b[id_col] if n == side else pa.nulls(b.num_rows, pair_types[i])
        cols["_kind"] = pa.array(np.zeros(b.num_rows, np.int8))
        cols[data_col] = b[data_col]
        cols["_part"] = pa.array(part.astype(np.int64))
        return pa.table(cols)

    left = pairs.map_batches(
        pairs_part, batch_format="pyarrow", zero_copy_batch=True
    )
    right = data.map_batches(
        data_part, batch_format="pyarrow", zero_copy_batch=True
    )

    def attach(g: pa.Table) -> pa.Table:
        kind = np.asarray(g["_kind"], dtype=np.int8)
        is_data = kind == 0
        is_pair = kind == 1
        if not is_pair.any():
            return _empty_out(g, pair_names, data_col, out_col)
        data_tbl = g.filter(pa.array(is_data))
        pair_tbl = g.filter(pa.array(is_pair))
        d_ids = np.asarray(data_tbl[side], dtype=np.int64)
        d_vals, d_offs = _flat_lists(data_tbl[data_col])
        order = np.argsort(d_ids, kind="stable")
        d_ids_s = d_ids[order]
        lens = np.diff(d_offs)[order]
        starts_src = d_offs[:-1][order]
        p_keys = np.asarray(pair_tbl[side], dtype=np.int64)
        if len(d_ids_s) == 0:
            return _empty_out(g, pair_names, data_col, out_col)
        pos_c = np.clip(
            np.searchsorted(d_ids_s, p_keys), 0, len(d_ids_s) - 1
        )
        hit = d_ids_s[pos_c] == p_keys
        pair_tbl = pair_tbl.filter(pa.array(hit))
        pos_c = pos_c[hit]
        # gather ragged runs for the hit rows
        l = lens[pos_c]
        total = int(l.sum())
        if total:
            ns = np.concatenate(([0], np.cumsum(l)))
            within = np.arange(total) - np.repeat(ns[:-1], l)
            idx = np.repeat(starts_src[pos_c], l) + within
            flat = d_vals[idx]
        else:
            ns = np.zeros(len(pos_c) + 1, np.int64)
            flat = np.empty(0, np.int64)
        if ns[-1] < 2**31:
            out_list = pa.ListArray.from_arrays(
                pa.array(ns, pa.int32()), pa.array(flat, pa.int64())
            )
        else:
            out_list = pa.LargeListArray.from_arrays(
                pa.array(ns, pa.int64()), pa.array(flat, pa.int64())
            )
        keep_cols = [
            n
            for n in pair_tbl.column_names
            if n not in ("_kind", "_part", data_col)
        ]
        out_tbl = pair_tbl.select(keep_cols)
        if out_col in out_tbl.column_names:
            out_tbl = out_tbl.drop_columns([out_col])
        return out_tbl.append_column(out_col, out_list)

    return left.union(right).groupby("_part").map_groups(
        attach, batch_format="pyarrow"
    )


def _empty_out(g, pair_names, data_col, out_col):
    keep = [n for n in g.column_names if n not in ("_kind", "_part", data_col)]
    t = g.slice(0, 0).select(keep)
    if out_col in t.column_names:
        t = t.drop_columns([out_col])
    return t.append_column(out_col, pa.nulls(0, pa.list_(pa.int64())))


def verify_pairs_distributed(
    candidates: Dataset,
    signatures: Dataset,
    cfg: FuzzyConfig | None = None,
    id_col: str = "row_id",
    num_parts: int = 32,
    margin: float = 0.09,
) -> Dataset:
    """→ (id_a, id_b) pairs passing Jaccard ≥ cfg.jaccard_threshold.

    Tier-1 minhash estimate decides clear cases; tier-2 exact Jaccard (via
    co-partitioned shingle attachment) decides the borderline band.
    """
    import ray

    cfg = cfg or FuzzyConfig()
    thr = cfg.jaccard_threshold
    n_perm = cfg.num_perms

    # restrict the per-doc data to candidate ids BEFORE co-partitioning —
    # otherwise every signature/shingle row in the corpus rides the shuffle.
    # The id list is ids-only (8B/row), broadcast once.
    candidates = candidates.materialize()
    id_chunks: list[np.ndarray] = []
    for b in candidates.iter_batches(batch_format="pyarrow", batch_size=None):
        id_chunks.append(np.asarray(b["id_a"], dtype=np.int64))
        id_chunks.append(np.asarray(b["id_b"], dtype=np.int64))
    cand_ids = (
        np.unique(np.concatenate(id_chunks))
        if id_chunks
        else np.empty(0, np.int64)
    )
    cand_ref = ray.put(cand_ids)

    def keep_cands(b: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)  # sorted unique
        col = np.asarray(b[id_col])
        if len(wanted) == 0:
            return b.slice(0, 0)
        pos = np.clip(np.searchsorted(wanted, col), 0, len(wanted) - 1)
        return b.filter(pa.array(wanted[pos] == col))

    sigs = (
        signatures.select_columns([id_col, "minhash"])
        .map_batches(keep_cands, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    with_a = _attach_side(
        candidates, sigs, "id_a", id_col, "minhash", "sig_a", num_parts
    )
    with_ab = _attach_side(
        with_a, sigs, "id_b", id_col, "minhash", "sig_b", num_parts
    )

    hi = int(np.ceil(n_perm * min(1.0, thr + margin)))
    lo = int(np.floor(n_perm * max(0.0, thr - margin)))

    def classify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "state": pa.array([], pa.int8()),
                }
            )
        va, oa = _flat_lists(b["sig_a"])
        vb, ob = _flat_lists(b["sig_b"])
        n = b.num_rows
        sa = va.reshape(n, n_perm)
        sb = vb.reshape(n, n_perm)
        m = (sa == sb).sum(axis=1)
        state = np.where(m >= hi, 2, np.where(m < lo, 0, 1)).astype(np.int8)
        return pa.table(
            {
                "id_a": b["id_a"],
                "id_b": b["id_b"],
                "state": pa.array(state),
            }
        )

    classified = with_ab.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    accepted = classified.filter(expr="state == 2").select_columns(
        ["id_a", "id_b"]
    )
    borderline = classified.filter(expr="state == 1").select_columns(
        ["id_a", "id_b"]
    )

    # shingles only for ids appearing in borderline pairs (usually a small
    # fraction of candidates)
    bl_chunks: list[np.ndarray] = []
    borderline = borderline.materialize()
    for b in borderline.iter_batches(batch_format="pyarrow", batch_size=None):
        bl_chunks.append(np.asarray(b["id_a"], dtype=np.int64))
        bl_chunks.append(np.asarray(b["id_b"], dtype=np.int64))
    bl_ids = (
        np.unique(np.concatenate(bl_chunks))
        if bl_chunks
        else np.empty(0, np.int64)
    )
    bl_ref = ray.put(bl_ids)

    def keep_borderline(b: pa.Table) -> pa.Table:
        wanted = ray.get(bl_ref)  # sorted unique
        col = np.asarray(b[id_col])
        if len(wanted) == 0:
            return b.slice(0, 0)
        pos = np.clip(np.searchsorted(wanted, col), 0, len(wanted) - 1)
        return b.filter(pa.array(wanted[pos] == col))

    shingle_data = (
        signatures.select_columns([id_col, "shingles"])
        .map_batches(
            keep_borderline, batch_format="pyarrow", zero_copy_batch=True
        )
        .materialize()
    )
    b_a = _attach_side(
        borderline, shingle_data, "id_a", id_col, "shingles", "sh_a", num_parts
    )
    b_ab = _attach_side(
        b_a, shingle_data, "id_b", id_col, "shingles", "sh_b", num_parts
    )

    def exact(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        va, oa = _flat_lists(b["sh_a"])
        vb, ob = _flat_lists(b["sh_b"])
        keep = np.zeros(b.num_rows, dtype=bool)
        for i in range(b.num_rows):
            sa = va[oa[i] : oa[i + 1]]
            sb = vb[ob[i] : ob[i + 1]]
            if len(sa) == 0 or len(sb) == 0:
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            keep[i] = union > 0 and inter / union >= thr
        return pa.table(
            {"id_a": b["id_a"], "id_b": b["id_b"]}
        ).filter(pa.array(keep))

    exact_passed = b_ab.map_batches(
        exact, batch_format="pyarrow", zero_copy_batch=True
    )
    return accepted.union(exact_passed)
