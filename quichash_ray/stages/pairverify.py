"""Distributed candidate-pair verification — two-tier, broadcast-free.

Verifying LSH candidates needs per-document data (minhash signatures /
shingle sets) on both sides of each pair. Broadcasting a corpus-wide lookup
scales with the corpus; this stage instead **co-partitions pairs with the
per-doc data by hash(key) % P** — the classic repartition-join expressed as
one Ray Data groupby per side, all data volumes proportional to the
candidate set.

Per-doc payloads ride the shuffles as ``large_binary`` columns (a minhash
signature is the 1024-byte little-endian image of 128 uint64 components; a
shingle set is the byte image of its sorted uint64 hashes). Ray's sort-based
shuffle moves binary columns as flat buffers — the ``list<int64>`` encoding
this replaces was measured ~10x slower through the same shuffle (round-1
NOTES thread 1-2).

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
from quichash_ray.stages.partitioning import choose_num_parts

_MULT = np.uint64(0x9E3779B97F4A7C15)


def binary_col_parts(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """large_binary column → (uint8 values, int64 offsets) numpy views."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_binary(col.type):
        col = col.cast(pa.large_binary())
    # slice-safe: rebuild offsets relative to the array's logical window
    off = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset : col.offset + len(col) + 1
    ]
    vals = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return vals, off


def binary_fixed_matrix(col, row_bytes: int) -> np.ndarray:
    """large_binary column of uniform ``row_bytes`` rows → (n, row_bytes/8)
    uint64 matrix (zero-copy when the buffer is contiguous)."""
    vals, off = binary_col_parts(col)
    n = len(off) - 1
    if n == 0:
        return np.empty((0, row_bytes // 8), np.uint64)
    widths = np.diff(off)
    if not (widths == row_bytes).all():
        raise ValueError("non-uniform binary rows")
    start, end = off[0], off[-1]
    return (
        vals[start:end]
        .view(np.uint64)
        .reshape(n, row_bytes // 8)
    )


def fixed_list_to_binary(col, width: int) -> pa.Array:
    """fixed_size_list<int64, width> → large_binary of width*8-byte rows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.int64)
    n = len(col)
    offs = np.arange(n + 1, dtype=np.int64) * (width * 8)
    return pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())],
    )


def uint64s_to_binary_rows(flat: np.ndarray, offsets: np.ndarray) -> pa.Array:
    """Ragged uint64 rows (CSR flat + element offsets) → large_binary."""
    return pa.Array.from_buffers(
        pa.large_binary(),
        len(offsets) - 1,
        [
            None,
            pa.py_buffer((offsets.astype(np.int64) * 8).tobytes()),
            pa.py_buffer(flat.astype(np.uint64).tobytes()),
        ],
    )


def collect_pair_ids(pairs: Dataset) -> np.ndarray:
    """Sorted unique ids over (id_a, id_b) of a materialized pair dataset.

    Per-block uniques run as remote tasks; the driver only merges the
    (already-deduplicated) id arrays — bounded by the candidate set, never
    the corpus.
    """
    import ray

    @ray.remote
    def block_ids(ref) -> np.ndarray:
        t = ref if isinstance(ref, pa.Table) else ray.get(ref)
        if not t.num_rows:
            return np.empty(0, np.int64)
        return np.unique(
            np.concatenate(
                [
                    np.asarray(t["id_a"], dtype=np.int64),
                    np.asarray(t["id_b"], dtype=np.int64),
                ]
            )
        )

    refs = [block_ids.remote(r) for r in pairs.to_arrow_refs()]
    parts = ray.get(refs)
    return (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    )


def make_id_filter(id_ref, id_col: str):
    """Batch filter keeping rows whose ``id_col`` is in the broadcast sorted
    unique id array (``ray.put`` once, zero-copy same-node gets)."""
    import ray

    def keep(b: pa.Table) -> pa.Table:
        from quichash_ray.stages.broadcast import cached_get

        wanted = cached_get(id_ref)  # sorted unique, cached per worker
        col = np.asarray(b[id_col])
        if len(wanted) == 0:
            return b.slice(0, 0)
        pos = np.clip(np.searchsorted(wanted, col), 0, len(wanted) - 1)
        return b.filter(pa.array(wanted[pos] == col))

    return keep


def shingle_col_to_csr(col) -> tuple[np.ndarray, np.ndarray]:
    """``shingles`` column (large_binary image, or legacy list<int64>) →
    (uint64 flat values, int64 element offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_binary(col.type) or pa.types.is_binary(col.type):
        vals, off = binary_col_parts(col)
        return vals.view(np.uint64), off // 8
    vals = np.asarray(col.values, dtype=np.int64).view(np.uint64)
    offs = np.asarray(col.offsets, dtype=np.int64)
    return vals, offs


def make_shingle_recompute_fn(id_ref, id_col: str, text_col: str, k: int):
    """Batch fn: content rows → (id, shingles large_binary) for ids in the
    broadcast sorted id array only — shingle sets are recomputed on demand
    for exactly the rows verification needs, never stored corpus-wide."""
    from quichash_ray.pipelines.ngram import gram_hashes as _gh

    keep = make_id_filter(id_ref, id_col)

    def fn(b: pa.Table) -> pa.Table:
        sel = keep(b)
        ids_out, lists_out = [], []
        for rid, text in zip(
            sel[id_col].to_pylist(), sel[text_col].to_pylist()
        ):
            ids_out.append(rid)
            lists_out.append(_gh((text or "").split(), k))
        flat = (
            np.concatenate(lists_out) if lists_out else np.empty(0, np.uint64)
        )
        offs = np.concatenate(
            ([0], np.cumsum([len(x) for x in lists_out]))
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids_out, pa.int64()),
                "shingles": uint64s_to_binary_rows(flat, offs),
            }
        )

    return fn


def _attach_side(
    pairs: Dataset,
    data: Dataset,
    side: str,
    id_col: str,
    data_col: str,
    out_col: str,
    num_parts: int,
    pair_schema: list[tuple[str, pa.DataType]] | None = None,
) -> Dataset:
    """pairs ⟕ data(id → large_binary column) on ``side`` via co-partitioned
    groupby.

    ``pairs`` may carry prior binary columns (they ride the shuffle as flat
    buffers). Rows whose key has no data row are dropped (inner-join
    semantics — a candidate id always has a signature row by construction).
    ``pair_schema`` (name, type) avoids a ``Dataset.schema()`` call on a
    lazy ``pairs`` plan (which can force execution).
    """
    if pair_schema is None:
        pair_schema = list(
            zip(pairs.schema().names, pairs.schema().types)
        )
    pair_names = [n for n, _ in pair_schema]
    pair_types = [t for _, t in pair_schema]

    def pairs_part(b: pa.Table) -> pa.Table:
        # fresh table (no carried-over schema metadata — pandas metadata
        # dicts break Ray's block-schema dedup in the sort reduce)
        key = np.asarray(b[side], dtype=np.int64).view(np.uint64)
        part = ((key * _MULT) >> np.uint64(40)) % np.uint64(num_parts)
        cols = {n: b[n] for n in pair_names if n != data_col}
        cols["_kind"] = pa.array(np.ones(b.num_rows, np.int8))
        cols[data_col] = pa.nulls(b.num_rows, pa.large_binary())
        cols["_part"] = pa.array(part.astype(np.int64))
        return pa.table(cols)

    def data_part(b: pa.Table) -> pa.Table:
        key = np.asarray(b[id_col], dtype=np.int64).view(np.uint64)
        part = ((key * _MULT) >> np.uint64(40)) % np.uint64(num_parts)
        # a pairs-shaped shell row per data row, key in `side`, rest null
        cols = {}
        for i, n in enumerate(pair_names):
            cols[n] = (
                b[id_col] if n == side else pa.nulls(b.num_rows, pair_types[i])
            )
        cols["_kind"] = pa.array(np.zeros(b.num_rows, np.int8))
        col = b[data_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols[data_col] = col.cast(pa.large_binary())
        cols["_part"] = pa.array(part.astype(np.int64))
        return pa.table(cols)

    left = pairs.map_batches(
        pairs_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    right = data.map_batches(
        data_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def attach(g: pa.Table) -> pa.Table:
        keep_cols = [n for n in pair_names if n != data_col]

        def empty_out() -> pa.Table:
            # schema-independent empty result (an all-empty partition can
            # arrive with an upstream schema — Ray passes empty blocks
            # through map_batches without calling the UDF)
            cols = {
                n: pa.array([], t)
                for n, t in zip(pair_names, pair_types)
                if n != data_col
            }
            cols[out_col] = pa.nulls(0, pa.large_binary())
            return pa.table(cols)

        if g.num_rows == 0 or "_kind" not in g.column_names:
            return empty_out()
        kind = np.asarray(g["_kind"], dtype=np.int8)
        is_data = kind == 0
        is_pair = kind == 1
        if not is_pair.any() or not is_data.any():
            return empty_out()
        data_tbl = g.filter(pa.array(is_data))
        pair_tbl = g.filter(pa.array(is_pair))
        d_ids = np.asarray(data_tbl[side], dtype=np.int64)
        order = np.argsort(d_ids, kind="stable")
        d_ids_s = d_ids[order]
        p_keys = np.asarray(pair_tbl[side], dtype=np.int64)
        pos_c = np.clip(np.searchsorted(d_ids_s, p_keys), 0, len(d_ids_s) - 1)
        hit = d_ids_s[pos_c] == p_keys
        pair_tbl = pair_tbl.filter(pa.array(hit))
        d_col = data_tbl[data_col]
        if isinstance(d_col, pa.ChunkedArray):
            d_col = d_col.combine_chunks()
        gathered = d_col.take(pa.array(order[pos_c[hit]], pa.int64()))
        out_tbl = pair_tbl.select(keep_cols)
        return out_tbl.append_column(out_col, gathered)

    from quichash_ray.stages.exchange import hash_exchange

    return hash_exchange(
        [left, right], "_part", attach, num_parts, drop_part=False
    )


def exact_jaccard_filter(
    b: pa.Table, thr: float, a_col: str = "sh_a", b_col: str = "sh_b"
) -> pa.Table:
    """Keep (id_a, id_b) rows whose exact shingle Jaccard ≥ thr.

    Shingle sets arrive as large_binary images of sorted uint64 arrays; the
    per-pair intersect runs only on the (few) borderline pairs.
    """
    if b.num_rows == 0:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
    va, oa = binary_col_parts(b[a_col])
    vb, ob = binary_col_parts(b[b_col])
    va64 = va.view(np.uint64) if len(va) % 8 == 0 else np.empty(0, np.uint64)
    vb64 = vb.view(np.uint64) if len(vb) % 8 == 0 else np.empty(0, np.uint64)
    keep = np.zeros(b.num_rows, dtype=bool)
    for i in range(b.num_rows):
        sa = va64[oa[i] // 8 : oa[i + 1] // 8]
        sb = vb64[ob[i] // 8 : ob[i + 1] // 8]
        if len(sa) == 0 or len(sb) == 0:
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        keep[i] = union > 0 and inter / union >= thr
    return pa.table({"id_a": b["id_a"], "id_b": b["id_b"]}).filter(
        pa.array(keep)
    )


def verify_pairs_distributed(
    candidates: Dataset,
    signatures: Dataset,
    cfg: FuzzyConfig | None = None,
    id_col: str = "row_id",
    num_parts: int | None = None,
    margin: float = 0.09,
    content: Dataset | None = None,
    text_col: str = "content",
) -> Dataset:
    """→ (id_a, id_b) pairs passing Jaccard ≥ cfg.jaccard_threshold.

    Tier-1 minhash estimate decides clear cases; tier-2 exact Jaccard (via
    co-partitioned shingle attachment) decides the borderline band. Shingle
    sets for tier 2 come from ``content`` (recomputed for borderline ids
    only — nothing corpus-wide is ever stored) when given, else from a
    ``shingles`` column on ``signatures``.
    """
    import os
    import time as _time

    import ray

    _prof = bool(os.environ.get("QUICHASH_PROFILE"))
    _t0 = _time.time()

    def _mark(label: str) -> None:
        nonlocal _t0
        if _prof:
            print(
                f"[pairverify-profile] {label}: {_time.time() - _t0:.2f}s",
                flush=True,
            )
            _t0 = _time.time()

    cfg = cfg or FuzzyConfig()
    thr = cfg.jaccard_threshold
    n_perm = cfg.num_perms
    sig_bytes = n_perm * 8

    # restrict the per-doc data to candidate ids BEFORE co-partitioning —
    # otherwise every signature row in the corpus rides the shuffle. The id
    # list is ids-only (8B/row); per-block uniques run remotely.
    candidates = candidates.materialize()
    _mark(f"candidates_materialize({candidates.count()})")
    cand_ids = collect_pair_ids(candidates)
    cand_ref = ray.put(cand_ids)
    if num_parts is None:
        num_parts = choose_num_parts(
            len(cand_ids), bytes_per_row=sig_bytes, target_bytes=64 << 20
        )

    keep_cands = make_id_filter(cand_ref, id_col)

    def sig_to_binary(b: pa.Table) -> pa.Table:
        b = keep_cands(b)
        return pa.table(
            {
                id_col: b[id_col],
                "minhash": fixed_list_to_binary(b["minhash"], n_perm),
            }
        )

    sigs = (
        signatures.select_columns([id_col, "minhash"])
        .map_batches(sig_to_binary, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .materialize()
    )
    _mark(f"sigs_filtered({len(cand_ids)} ids, P={num_parts})")
    pair_ids_schema = [("id_a", pa.int64()), ("id_b", pa.int64())]
    with_a = _attach_side(
        candidates, sigs, "id_a", id_col, "minhash", "sig_a", num_parts,
        pair_schema=pair_ids_schema,
    )
    with_ab = _attach_side(
        with_a, sigs, "id_b", id_col, "minhash", "sig_b", num_parts,
        pair_schema=pair_ids_schema + [("sig_a", pa.large_binary())],
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
        sa = binary_fixed_matrix(b["sig_a"], sig_bytes)
        sb = binary_fixed_matrix(b["sig_b"], sig_bytes)
        m = (sa == sb).sum(axis=1)
        state = np.where(m >= hi, 2, np.where(m < lo, 0, 1)).astype(np.int8)
        return pa.table(
            {"id_a": b["id_a"], "id_b": b["id_b"], "state": pa.array(state)}
        )

    classified = with_ab.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()
    _mark("attach_sigs+classify")

    accepted = classified.filter(expr="state == 2").select_columns(
        ["id_a", "id_b"]
    )
    borderline = (
        classified.filter(expr="state == 1")
        .select_columns(["id_a", "id_b"])
        .materialize()
    )
    _mark(f"borderline_materialize({borderline.count()})")

    # shingles only for ids appearing in borderline pairs (usually a small
    # fraction of candidates)
    bl_ids = collect_pair_ids(borderline)
    bl_ref = ray.put(bl_ids)
    bl_parts = choose_num_parts(
        len(bl_ids), bytes_per_row=4096, target_bytes=64 << 20
    )
    keep_borderline = make_id_filter(bl_ref, id_col)

    if content is not None:
        # recompute shingles for borderline ids straight from content —
        # avoids materializing a corpus-wide shingle column anywhere
        shingle_data = content.select_columns([id_col, text_col]).map_batches(
            make_shingle_recompute_fn(bl_ref, id_col, text_col, cfg.shingle_k),
            batch_format="pyarrow",
            zero_copy_batch=True, batch_size=None,
        )
    else:

        def shingle_to_binary(b: pa.Table) -> pa.Table:
            b = keep_borderline(b)
            vals, offs = shingle_col_to_csr(b["shingles"])
            return pa.table(
                {
                    id_col: b[id_col],
                    "shingles": uint64s_to_binary_rows(vals, offs),
                }
            )

        shingle_data = signatures.select_columns(
            [id_col, "shingles"]
        ).map_batches(
            shingle_to_binary, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    # bounded by borderline ids; materialized so the content scan runs once
    # (two attach shuffles consume it)
    shingle_data = shingle_data.materialize()
    _mark("shingle_data")

    b_a = _attach_side(
        borderline, shingle_data, "id_a", id_col, "shingles", "sh_a", bl_parts,
        pair_schema=pair_ids_schema,
    )
    b_ab = _attach_side(
        b_a, shingle_data, "id_b", id_col, "shingles", "sh_b", bl_parts,
        pair_schema=pair_ids_schema + [("sh_a", pa.large_binary())],
    )

    exact_passed = b_ab.map_batches(
        lambda b: exact_jaccard_filter(b, thr),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    ).materialize()
    _mark("tier2_exact")
    return accepted.union(exact_passed)
