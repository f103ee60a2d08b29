"""Similarity search over an embedding column (list<float>).

Brute-force cosine is the exactness baseline. The comparison side never
touches the driver: a-side blocks are normalized by REMOTE tasks and live in
plasma; every ``map_batches`` task streams its batch against those block
refs one at a time (zero-copy same-node gets) — a blocked self-join whose
peak worker memory is one a-block, with no driver materialization and no
shuffle. Per-batch partial top-k keeps only ``k`` candidates per query per
batch; the final exact top-k is a single small groupby.

The scale path is ``lsh_bucketed_neardup``: OR-amplified random-hyperplane
LSH — L independent bands of k planes each (planes built once per worker
process and cached), one banded id-only shuffle to surface same-bucket
candidate pairs, then exact cosine verification of the (sparse) candidates
against plasma-resident vector shards. Recall = 1-(1-p^k)^L with
p = 1 - θ/π; pick k by the target threshold (k=4 for loose thresholds like
0.4, k=8-12 for production near-dup thresholds ≥0.85) and L for the recall
target. A pytest gate holds recall ≥ 0.9 vs the exact pairs at the test
config; ``embedding_recall_report`` reports it per run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch[emb_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # fixed-length lists → (n, d) float64 without a Python loop
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(len(col), -1)


def _normalized_block_refs(
    ds: Dataset, id_col: str, emb_col: str, prepared: bool = False
) -> list:
    """Materialize (id, embedding) and normalize each block REMOTELY —
    returns refs to (ids int64, unit-norm float64 matrix) tuples in plasma.
    The driver holds only the refs. ``prepared=True`` skips the
    select+materialize when the caller already holds a materialized
    (id, embedding) projection (avoids a second object-store copy of the
    fattest column)."""
    import ray

    @ray.remote
    def prep(t: pa.Table):
        ids = np.asarray(t[id_col], dtype=np.int64)
        if len(ids) == 0:
            return ids, np.empty((0, 1), np.float64)
        mat = _emb_matrix(t, emb_col)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return ids, mat

    src = ds if prepared else ds.select_columns([id_col, emb_col]).materialize()
    return [prep.remote(r) for r in src.to_arrow_refs()]


def knn_topk(
    ds: Dataset,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """Exact cosine top-k for a small query set → (query_id, vec_id, rank).

    Ties broken by ascending vec_id — deterministic under any parallelism.
    Self-matches excluded.
    """
    import pyarrow.compute as pc
    import ray

    qset = pa.array(sorted(query_ids), pa.int64())

    def keep_queries(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[id_col], value_set=qset))

    filtered = (
        ds.select_columns([id_col, emb_col])
        .map_batches(keep_queries, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .materialize()
    )
    q_tbl = pa.concat_tables(
        [ray.get(r) for r in filtered.to_arrow_refs()]
    )  # query rows only — tiny by contract
    order = np.argsort(np.asarray(q_tbl[id_col], dtype=np.int64))
    q_ids = np.asarray(q_tbl[id_col], dtype=np.int64)[order]
    q_mat = _emb_matrix(q_tbl, emb_col)[order]
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        from quichash_ray.stages.broadcast import cached_get

        ids, qm = cached_get(q_ref)
        vecs = _emb_matrix(batch, emb_col)
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = qm @ vecs.T  # (q, n)
        vids = np.asarray(batch[id_col], dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(ids):
            row = sims[qi]
            mask = vids != qid
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            order = np.lexsort((vids[cand_idx], -row[cand_idx]))[:k]
            sel = cand_idx[order]
            out_q.extend([qid] * len(sel))
            out_v.extend(vids[sel].tolist())
            out_s.extend(row[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = ds.map_batches(
        partial_topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", id_col, "rank"]]

    return partials.groupby("query_id").map_groups(
        final_topk, batch_format="pandas"
    )


def cosine_neardup_pairs(
    ds: Dataset,
    threshold: float,
    a_limit: int | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    a_ids: "np.ndarray | None" = None,
) -> Dataset:
    """Embedding near-dup pairs: (a, b) with a < b (a < a_limit when given)
    and cosine(a, b) >= threshold → (vec_id_a, vec_id_b).

    Blocked self-join: the a-side is normalized block-by-block by remote
    tasks into plasma; each b-side batch loops over the a-block refs with
    zero-copy gets. No driver materialization, no per-row lambdas, no
    shuffle. At 10^9+ vectors switch to ``lsh_bucketed_neardup``.

    ``a_ids`` restricts the a-side to a fixed id set (the sampled-query
    budget of :func:`embedding_recall_report`): enumeration becomes
    SYMMETRIC (every partner of a sampled id, not just larger ids) with
    canonical (min, max) output, and cost drops from O(n²) to
    O(|a_ids|·n). A pair with BOTH endpoints sampled is emitted twice —
    consumers of this mode (the recall reports) collect into sets.
    """
    import ray

    symmetric = a_ids is not None
    if symmetric:
        sample_sorted = np.sort(np.asarray(a_ids, dtype=np.int64))

        def keep_sampled(b: pa.Table) -> pa.Table:
            col = np.asarray(b[id_col], dtype=np.int64)
            if len(sample_sorted) == 0:
                return b.slice(0, 0)
            pos = np.clip(
                np.searchsorted(sample_sorted, col),
                0,
                len(sample_sorted) - 1,
            )
            return b.filter(pa.array(sample_sorted[pos] == col))

        a_side = ds.map_batches(
            keep_sampled,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
    else:
        a_side = (
            ds if a_limit is None else ds.filter(expr=f"{id_col} < {a_limit}")
        )
    a_refs = _normalized_block_refs(a_side, id_col, emb_col)

    def find_pairs(batch: pa.Table) -> pa.Table:
        vecs = _emb_matrix(batch, emb_col)
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        vids = np.asarray(batch[id_col], dtype=np.int64)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        strip = 4096  # bound the sims matrix to |a_block| × strip
        for ref in a_refs:
            ids_a, am = ray.get(ref)  # zero-copy same-node
            if len(ids_a) == 0:
                continue
            # chunk the a-rows so the cached scratch stays a fixed
            # a_chunk × strip = 64 MB per worker (an unbounded
            # |a_block|-row buffer pinned in _VERIFY_SCRATCH would turn
            # a transient allocation into permanent multi-GB residency
            # under the long idle-worker keepalive)
            a_chunk = 2048
            buf = _VERIFY_SCRATCH.get("mm")
            if buf is None:
                buf = np.empty((a_chunk, strip), np.float64)
                _VERIFY_SCRATCH["mm"] = buf
            for a0 in range(0, len(ids_a), a_chunk):
                am_c = am[a0 : a0 + a_chunk]
                ia_c = ids_a[a0 : a0 + a_chunk]
                for s in range(0, len(vids), strip):
                    vs = vecs[s : s + strip]
                    vi = vids[s : s + strip]
                    sims = np.matmul(
                        am_c, vs.T, out=buf[: len(ia_c), : len(vi)]
                    )
                    cmp = (
                        (ia_c[:, None] != vi[None, :])
                        if symmetric
                        else (ia_c[:, None] < vi[None, :])
                    )
                    hit_a, hit_b = np.nonzero((sims >= threshold) & cmp)
                    out_a.append(ia_c[hit_a])
                    out_b.append(vi[hit_b])
        a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        if symmetric:
            a, b = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "vec_id_a": pa.array(a, pa.int64()),
                "vec_id_b": pa.array(b, pa.int64()),
            }
        )

    return ds.map_batches(
        find_pairs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


_PLANE_CACHE: dict[tuple, np.ndarray] = {}

# per-worker scratch for the pair-verify gathers: allocating two fresh
# |pairs|×d float64 arrays per block re-pays the host's first-touch
# page-fault cost on every task (measured on the bench VM: intermittent
# ~90 µs/page storms — 17 s for a 184 MB gather that computes in 30 ms
# warm). Reusing bounded buffers pays it once per worker process.
_VERIFY_SCRATCH: dict[object, np.ndarray] = {}
_VERIFY_STRIDE = 65536


def _pair_sims(m_a, ia, m_b, ib) -> np.ndarray:
    """cosine dot products m_a[ia[i]] · m_b[ib[i]] per pair, chunked
    through per-worker scratch buffers (see _VERIFY_SCRATCH note)."""
    d = m_a.shape[1]
    ka = _VERIFY_SCRATCH.setdefault(
        ("a", d), np.empty((_VERIFY_STRIDE, d), np.float64)
    )
    kb = _VERIFY_SCRATCH.setdefault(
        ("b", d), np.empty((_VERIFY_STRIDE, d), np.float64)
    )
    out = np.empty(len(ia), np.float64)
    for s in range(0, len(ia), _VERIFY_STRIDE):
        e = min(s + _VERIFY_STRIDE, len(ia))
        n = e - s
        np.take(m_a, ia[s:e], axis=0, out=ka[:n])
        np.take(m_b, ib[s:e], axis=0, out=kb[:n])
        np.multiply(ka[:n], kb[:n], out=ka[:n])
        out[s:e] = ka[:n].sum(axis=1)
    return out


def _band_planes(
    seed: int, dim: int, num_bands: int, num_planes: int
) -> np.ndarray:
    """(num_bands, dim, num_planes) plane tensor — built once per worker
    process (module cache), seeded per band for independence."""
    key = (seed, dim, num_bands, num_planes)
    planes = _PLANE_CACHE.get(key)
    if planes is None:
        planes = np.stack(
            [
                np.random.Generator(
                    np.random.Philox(key=[seed, band + 1])
                ).standard_normal((dim, num_planes))
                for band in range(num_bands)
            ]
        )
        _PLANE_CACHE[key] = planes
    return planes



def _pairs_from_buckets(
    bucketed: Dataset,
    num_parts: int,
    bucket_cap: int,
    metrics,
    metric_prefix: str,
    id_col: str,
) -> Dataset:
    """(id, bkey, part) bucket rows → deduplicated candidate (vec_id_a,
    vec_id_b) pairs via one banded id-only exchange; over-cap buckets are
    counted on the metrics actor — no silent caps."""
    from quichash_ray.stages.exchange import hash_exchange

    mult = np.uint64(0x9E3779B97F4A7C15)

    def local_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"vec_id_a": pa.array([], pa.int64()), "vec_id_b": pa.array([], pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        ids = np.asarray(g[id_col], dtype=np.int64)
        key = np.asarray(g["bkey"], dtype=np.int64)
        order = np.lexsort((ids, key))
        ids, key = ids[order], key[order]
        starts = np.flatnonzero(np.concatenate(([True], key[1:] != key[:-1])))
        counts = np.diff(np.concatenate((starts, [len(ids)])))
        over = counts > bucket_cap
        if over.any():
            metrics.add.remote(f"{metric_prefix}_dropped_buckets", int(over.sum()))
            metrics.add.remote(
                f"{metric_prefix}_dropped_bucket_rows", int(counts[over].sum())
            )
        out_a, out_b = [], []
        for st, c in zip(starts, counts):
            if c < 2 or c > bucket_cap:
                continue
            seg = ids[st : st + c]
            ia, ib = np.triu_indices(c, k=1)
            keep = seg[ia] != seg[ib]
            out_a.append(seg[ia][keep])
            out_b.append(seg[ib][keep])
        if not out_a:
            return empty
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        uniq = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table(
            {
                "vec_id_a": pa.array(uniq[:, 0], pa.int64()),
                "vec_id_b": pa.array(uniq[:, 1], pa.int64()),
            }
        )

    candidates = hash_exchange(bucketed, "part", local_pairs, num_parts)

    # global pair dedup (a pair can surface from several buckets)
    def pair_part(b: pa.Table) -> pa.Table:
        a = np.asarray(b["vec_id_a"], np.int64).view(np.uint64)
        bb = np.asarray(b["vec_id_b"], np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            part = ((a * mult) ^ (bb * np.uint64(0xD1B54A32D192ED03))) % (
                np.uint64(num_parts)
            )
        return b.append_column("dpart", pa.array(part.astype(np.int64)))

    def drop_dups(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"vec_id_a": pa.array([], pa.int64()), "vec_id_b": pa.array([], pa.int64())}
            )
        a = np.asarray(g["vec_id_a"], np.int64)
        b = np.asarray(g["vec_id_b"], np.int64)
        uniq = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table(
            {
                "vec_id_a": pa.array(uniq[:, 0], pa.int64()),
                "vec_id_b": pa.array(uniq[:, 1], pa.int64()),
            }
        )

    return hash_exchange(
        candidates.map_batches(
            pair_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "dpart",
        drop_dups,
        num_parts,
    )


def _exact_verify_pairs(
    data: Dataset,
    pairs: Dataset,
    threshold: float,
    id_col: str,
    emb_col: str,
    num_parts: int | None = None,
    broadcast_bytes: int = 64 << 20,
) -> Dataset:
    """Exact cosine verification of a candidate-pair set — candidate-bounded
    end to end, two tiers picked by the measured candidate-vector footprint.

    Both tiers start identically: vectors for exactly the ids appearing in
    candidate pairs (never the corpus) are normalized and binary-encoded
    (float64 LE rows) by a streaming filter over ``data``.

    - **Broadcast tier** (candidate vectors ≤ ``broadcast_bytes``): the
      filtered matrix is ``ray.put`` once and each pair batch verifies with
      one searchsorted + einsum — no further shuffle. This is the fast path
      when candidates are DENSE (loose thresholds / coarse buckets make the
      candidate set approach the quadratic pair set, where attaching two
      vectors per pair costs |pairs|·2·dim·8 bytes of shuffle — far more
      than one bounded broadcast). Per-worker memory is capped by
      ``broadcast_bytes``, not the corpus.
    - **Attach tier** (above the limit): pairs are CO-PARTITIONED with
      their vectors by hash(id) % P via :func:`pairverify._attach_side` —
      the same repartition-join discipline the minhash verifier uses.
      Per-task memory is one partition of pairs + their vectors.

    Nothing in either tier holds the corpus (the round-2 design merged
    every normalized shard into each worker — O(corpus) per worker, a
    scale-killer at 10^9 vectors; reference analog: the candidate-bounded
    discipline of verify.rs:264-361 generalized). The tiers are
    equivalence-tested."""
    import ray

    from quichash_ray.stages.pairverify import (
        _attach_side,
        binary_col_parts,
        collect_pair_ids,
        make_id_filter,
        uint64s_to_binary_rows,
    )
    from quichash_ray.stages.partitioning import choose_num_parts

    # _attach_side / collect_pair_ids speak (id_a, id_b)
    def to_generic(b: pa.Table) -> pa.Table:
        return pa.table(
            {"id_a": b["vec_id_a"], "id_b": b["vec_id_b"]}
        )

    cands = pairs.map_batches(
        to_generic, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()
    cand_ids = collect_pair_ids(cands)
    cand_ref = ray.put(cand_ids)
    keep = make_id_filter(cand_ref, id_col)
    if num_parts is None:
        num_parts = choose_num_parts(
            len(cand_ids), bytes_per_row=2048, target_bytes=64 << 20
        )

    from quichash_ray.state.metrics import get_metrics_actor

    metrics = get_metrics_actor()

    def vec_to_binary(b: pa.Table) -> pa.Table:
        b = keep(b)
        if b.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "vec": pa.nulls(0, pa.large_binary()),
                }
            )
        # observability for the candidate-boundedness invariant: the total
        # across batches equals |unique candidate ids|, never the corpus
        metrics.add.remote("ann_verify_vec_rows", b.num_rows)
        mat = _emb_matrix(b, emb_col)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        n, d = mat.shape
        offs = np.arange(n + 1, dtype=np.int64) * d
        return pa.table(
            {
                id_col: b[id_col],
                "vec": uint64s_to_binary_rows(
                    np.ascontiguousarray(mat).reshape(-1).view(np.uint64),
                    offs,
                ),
            }
        )

    # bounded by candidate ids, never the corpus; materialized because the
    # tier choice inspects its size and both tiers consume it
    vecs = (
        data.select_columns([id_col, emb_col])
        .map_batches(vec_to_binary, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .materialize()
    )

    # tier choice from block METADATA (no driver fetch in the attach tier):
    # the materialized vecs dataset is already candidate-filtered, so its
    # size ≈ |cand_ids| · (dim·8 + 8) bytes
    vec_bytes = vecs.size_bytes() or 0
    if vec_bytes <= broadcast_bytes:
        live = [
            t
            for t in (ray.get(r) for r in vecs.to_arrow_refs())
            if t.num_rows and "vec" in t.column_names
        ]
        if live:
            vt = pa.concat_tables(live)
            ids_b = np.asarray(vt[id_col], np.int64)
            vals, offs = binary_col_parts(vt["vec"].combine_chunks())
            d = int(offs[1] - offs[0]) // 8 if len(offs) > 1 else 1
            mat_b = (
                vals[offs[0] : offs[-1]]
                .view(np.float64)
                .reshape(-1, d)
            )
            order = np.argsort(ids_b)
            mref = ray.put((ids_b[order], np.ascontiguousarray(mat_b[order])))
        else:
            mref = ray.put((np.empty(0, np.int64), np.empty((0, 1), np.float64)))

        def verify_bcast(b: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "vec_id_a": pa.array([], pa.int64()),
                    "vec_id_b": pa.array([], pa.int64()),
                }
            )
            if b.num_rows == 0:
                return empty
            from quichash_ray.stages.broadcast import cached_get

            ids_s, m = cached_get(mref)
            a = np.asarray(b["id_a"], np.int64)
            bb = np.asarray(b["id_b"], np.int64)
            ia = np.searchsorted(ids_s, a)
            ib = np.searchsorted(ids_s, bb)
            sims = _pair_sims(m, ia, m, ib)
            hit = sims >= threshold
            return pa.table(
                {
                    "vec_id_a": pa.array(a[hit], pa.int64()),
                    "vec_id_b": pa.array(bb[hit], pa.int64()),
                }
            )

        return cands.map_batches(
            verify_bcast, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    pair_ids_schema = [("id_a", pa.int64()), ("id_b", pa.int64())]
    w_a = _attach_side(
        cands, vecs, "id_a", id_col, "vec", "vec_a", num_parts,
        pair_schema=pair_ids_schema,
    )
    w_ab = _attach_side(
        w_a, vecs, "id_b", id_col, "vec", "vec_b", num_parts,
        pair_schema=pair_ids_schema + [("vec_a", pa.large_binary())],
    )

    def verify(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id_a": pa.array([], pa.int64()),
                "vec_id_b": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0:
            return empty
        va, oa = binary_col_parts(b["vec_a"])
        vb, ob = binary_col_parts(b["vec_b"])
        d = int(oa[1] - oa[0]) // 8
        ma = va[oa[0] : oa[-1]].view(np.float64).reshape(-1, d)
        mb = vb[ob[0] : ob[-1]].view(np.float64).reshape(-1, d)
        idx = np.arange(len(ma), dtype=np.int64)
        sims = _pair_sims(ma, idx, mb, idx)
        hit = sims >= threshold
        return pa.table(
            {
                "vec_id_a": pa.array(
                    np.asarray(b["id_a"], np.int64)[hit], pa.int64()
                ),
                "vec_id_b": pa.array(
                    np.asarray(b["id_b"], np.int64)[hit], pa.int64()
                ),
            }
        )

    return w_ab.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def lsh_bucketed_neardup(
    ds: Dataset,
    threshold: float,
    num_planes: int = 4,
    num_bands: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_cap: int = 4096,
    num_parts: int | None = None,
) -> Dataset:
    """Scale path: OR-amplified multi-band hyperplane LSH.

    Each vector hashes into ``num_bands`` independent buckets (one per
    band, ``num_planes`` sign bits each); same-bucket id pairs become
    candidates via one banded id-only shuffle (embeddings do NOT ride the
    shuffle); candidates are verified with exact cosine against
    plasma-resident normalized shards. Recall ≈ 1-(1-p^k)^L with
    p = 1-θ/π. Over-cap buckets are counted on the metrics actor
    (``ann_dropped_buckets``) — no silent caps.
    → (vec_id_a, vec_id_b), a < b, deduplicated, cosine-verified.
    """
    import ray

    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.partitioning import dataset_num_parts
    from quichash_ray.state.metrics import get_metrics_actor

    metrics = get_metrics_actor()
    mult = np.uint64(0x9E3779B97F4A7C15)

    data = ds.select_columns([id_col, emb_col]).materialize()
    if num_parts is None:
        num_parts = dataset_num_parts(
            data, bytes_per_row=num_bands * 16, target_bytes=32 << 20
        )

    def bucket_rows(batch: pa.Table) -> pa.Table:
        vecs = _emb_matrix(batch, emb_col)
        n = len(vecs)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "bkey": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        planes = _band_planes(seed, vecs.shape[1], num_bands, num_planes)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        keys = np.empty((n, num_bands), dtype=np.uint64)
        for band in range(num_bands):
            bits = (vecs @ planes[band]) >= 0
            code = np.zeros(n, dtype=np.uint64)
            for j in range(num_planes):
                code = (code << np.uint64(1)) | bits[:, j].astype(np.uint64)
            with np.errstate(over="ignore"):
                keys[:, band] = (
                    code ^ (np.uint64(band + 1) * np.uint64(0xD1B54A32D192ED03))
                ) * mult
        flat_keys = keys.reshape(-1)
        part = flat_keys % np.uint64(num_parts)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, num_bands), pa.int64()),
                "bkey": pa.array(flat_keys.view(np.int64), pa.int64()),
                "part": pa.array(part.astype(np.int64)),
            }
        )

    bucketed = data.map_batches(
        bucket_rows, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    deduped = _pairs_from_buckets(
        bucketed, num_parts, bucket_cap, metrics, "ann", id_col
    )
    return _exact_verify_pairs(data, deduped, threshold, id_col, emb_col)



def _train_centroids(
    data: Dataset,
    nlist: int,
    train_rows: int,
    kmeans_iters: int,
    seed: int,
    emb_col: str,
) -> np.ndarray:
    """Lloyd's k-means (cosine, unit sphere) on a deterministic bounded
    sample — the standard IVF training recipe; the sample is the only
    driver-resident data at any corpus scale."""
    import ray

    sample_tbl = pa.concat_tables(
        [
            ray.get(r)
            for r in data.limit(train_rows).materialize().to_arrow_refs()
        ]
    )
    sample = _emb_matrix(sample_tbl, emb_col)
    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    k = min(nlist, len(sample))
    rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    centroids[c] = m / n
    return centroids


def ivf_bucketed_neardup(
    ds: Dataset,
    threshold: float,
    nlist: int = 32,
    nprobe: int = 2,
    train_rows: int = 10_000,
    kmeans_iters: int = 15,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_cap: int = 8192,
    num_parts: int | None = None,
) -> Dataset:
    """IVF scale path: coarse k-means quantizer → inverted-list buckets →
    exact cosine inside (multi-probed) cells.

    Train: Lloyd's k-means on a bounded ``train_rows`` sample (the standard
    IVF recipe — training is sample-based at any scale; the sample is the
    only driver-resident data). Assign: every vector lands in its
    ``nprobe`` nearest cells (multi-assignment plays the role of
    OR-amplification: a near-dup pair straddling a cell boundary still
    meets in the runner-up cell). Candidates then flow through the same
    banded id-only exchange + exact-cosine verification as the LSH path.
    Over-cap cells are counted under ``ivf_dropped_buckets``.
    → (vec_id_a, vec_id_b), a < b, deduplicated, cosine-verified.
    """
    import ray

    from quichash_ray.stages.partitioning import dataset_num_parts
    from quichash_ray.state.metrics import get_metrics_actor

    metrics = get_metrics_actor()
    data = ds.select_columns([id_col, emb_col]).materialize()
    if num_parts is None:
        num_parts = dataset_num_parts(
            data, bytes_per_row=nprobe * 16, target_bytes=32 << 20
        )

    cent_ref = ray.put(
        _train_centroids(data, nlist, train_rows, kmeans_iters, seed, emb_col)
    )

    # --- inverted-list assignment: nprobe cells per vector ---------------
    def bucket_rows(batch: pa.Table) -> pa.Table:
        from quichash_ray.stages.broadcast import cached_get

        cents = cached_get(cent_ref)
        vecs = _emb_matrix(batch, emb_col)
        n = len(vecs)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "bkey": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = vecs @ cents.T  # (n, k)
        p = min(nprobe, sims.shape[1])
        top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
        ids = np.asarray(batch[id_col], dtype=np.int64)
        bkey = top.reshape(-1).astype(np.int64)
        part = bkey.view(np.uint64) % np.uint64(num_parts)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, p), pa.int64()),
                "bkey": pa.array(bkey, pa.int64()),
                "part": pa.array(part.astype(np.int64)),
            }
        )

    bucketed = data.map_batches(
        bucket_rows, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    deduped = _pairs_from_buckets(
        bucketed, num_parts, bucket_cap, metrics, "ivf", id_col
    )
    return _exact_verify_pairs(data, deduped, threshold, id_col, emb_col)




def ivf_knn(
    ds: Dataset,
    query_ids: list[int],
    k: int = 5,
    nlist: int = 32,
    nprobe: int = 4,
    train_rows: int = 10_000,
    kmeans_iters: int = 15,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    data_assign: int = 2,
) -> Dataset:
    """Approximate cosine top-k via IVF: each query probes its ``nprobe``
    nearest cells and only same-cell data vectors are scored — the scan is
    pruned to ~(nprobe·data_assign)/nlist of the corpus per query instead
    of all of it. ``data_assign`` lists each data vector in its top-a
    cells (redundant inverted lists) so a neighbor just across a cell
    boundary is still scanned — measured recall@5 on the weakly-clustered
    test embeddings at nlist=16/nprobe=8: 0.86 (a=1) → 1.00 (a=2).
    Output shape matches :func:`knn_topk` (query_id, vec_id, rank); ranks
    are exact within the probed cells.
    """
    import pyarrow.compute as pc
    import ray

    data = ds.select_columns([id_col, emb_col]).materialize()
    centroids = _train_centroids(
        data, nlist, train_rows, kmeans_iters, seed, emb_col
    )

    qset = pa.array(sorted(query_ids), pa.int64())

    def keep_queries(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[id_col], value_set=qset))

    filtered = (
        data.map_batches(
            keep_queries, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).materialize()
    )
    q_tbl = pa.concat_tables([ray.get(r) for r in filtered.to_arrow_refs()])
    order = np.argsort(np.asarray(q_tbl[id_col], dtype=np.int64))
    q_ids = np.asarray(q_tbl[id_col], dtype=np.int64)[order]
    q_mat = _emb_matrix(q_tbl, emb_col)[order]
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    # probe membership matrix: (n_queries, nlist) bool
    q_sims = q_mat @ centroids.T
    p = min(nprobe, q_sims.shape[1])
    probe_cells = np.argpartition(-q_sims, p - 1, axis=1)[:, :p]
    probe_mat = np.zeros((len(q_ids), centroids.shape[0]), dtype=bool)
    probe_mat[np.arange(len(q_ids))[:, None], probe_cells] = True
    q_ref = ray.put((q_ids, q_mat, probe_mat, centroids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        from quichash_ray.stages.broadcast import cached_get

        ids, qm, probes, cents = cached_get(q_ref)
        vecs = _emb_matrix(batch, emb_col)
        if len(vecs) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        dsims = vecs @ cents.T  # (n, nlist)
        a = min(max(1, data_assign), dsims.shape[1])
        dtop = np.argpartition(-dsims, a - 1, axis=1)[:, :a]  # (n, a)
        sims = qm @ vecs.T  # (q, n)
        allowed = probes[:, dtop].any(axis=2)  # (q, n)
        vids = np.asarray(batch[id_col], dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(ids):
            row = sims[qi]
            mask = allowed[qi] & (vids != qid)
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            sel = cand_idx[np.lexsort((vids[cand_idx], -row[cand_idx]))[:k]]
            out_q.extend([qid] * len(sel))
            out_v.extend(vids[sel].tolist())
            out_s.extend(row[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            }
        )

    partials = data.map_batches(
        partial_topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", id_col, "rank"]]

    return partials.groupby("query_id").map_groups(
        final_topk, batch_format="pandas"
    )


def _md5_bottomk_ids(ds: Dataset, id_col: str, k: int) -> np.ndarray:
    """The ``k`` ids with smallest (md5(str(id)), id) — the hash_sample
    discipline (deterministic across runs/partitionings, no RNG), as a
    distributed partial-bottom-k: each block contributes ≤k candidates,
    the driver merge holds blocks×k tiny rows."""
    from quichash_ray.pipelines.sampling import _md5_hex

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        keys = _md5_hex(ids)
        order = sorted(range(len(ids)), key=lambda i: (keys[i], ids[i]))[:k]
        return pa.table(
            {
                id_col: pa.array([ids[i] for i in order], pa.int64()),
                "skey": pa.array([keys[i] for i in order], pa.string()),
            }
        )

    rows = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).take_all()
    rows.sort(key=lambda r: (r["skey"], r[id_col]))
    return np.array([r[id_col] for r in rows[:k]], np.int64)


def embedding_recall_report(
    ds: Dataset,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    method: str = "lsh",
    sample_queries: int | None = None,
    **ann_kwargs,
) -> pa.Table:
    """One-row report: exact vs ANN (``method``: lsh | ivf) near-dup pair
    counts and recall.

    recall_bp is integer basis points (e.g. 9500 = 95.00%) so the value is
    hash-stable across shuffle orders.

    ``sample_queries`` bounds the exact-truth side to the md5-order
    bottom-k sampled query ids (documented in-row as n_query_sample):
    exact pairs are enumerated only where ≥1 endpoint is sampled —
    O(sample·n) instead of O(n²) — and the ANN pair set is filtered to
    the same support, so recall_bp is the recall ON SAMPLED QUERIES (an
    estimate of full pair recall; at 10^7+ vectors the full exact truth
    is unaffordable by design). n_query_sample=0 means full truth.

    The exact and ANN pipelines are independent — they are consumed
    concurrently so report wall-time is max(), not sum(), of the sides.
    """
    sample = (
        _md5_bottomk_ids(ds, id_col, sample_queries)
        if sample_queries
        else None
    )
    exact = cosine_neardup_pairs(
        ds, threshold, id_col=id_col, emb_col=emb_col, a_ids=sample
    )
    ann_fn = lsh_bucketed_neardup if method == "lsh" else ivf_bucketed_neardup
    lsh = ann_fn(
        ds, threshold, id_col=id_col, emb_col=emb_col, **ann_kwargs
    )

    def pair_set(d: Dataset) -> set:
        out = set()
        for b in d.iter_batches(batch_format="pyarrow", batch_size=None):
            out.update(
                zip(
                    np.asarray(b["vec_id_a"], np.int64).tolist(),
                    np.asarray(b["vec_id_b"], np.int64).tolist(),
                )
            )
        return out

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        fut_e = pool.submit(pair_set, exact)
        fut_l = pool.submit(pair_set, lsh)
        e, l = fut_e.result(), fut_l.result()
    if sample is not None:
        sset = set(sample.tolist())
        l = {p for p in l if p[0] in sset or p[1] in sset}
    common = len(e & l)
    recall_bp = (10000 * common) // len(e) if e else 10000
    return pa.table(
        {
            "n_exact": pa.array([len(e)], pa.int64()),
            "n_lsh": pa.array([len(l)], pa.int64()),
            "n_common": pa.array([common], pa.int64()),
            "recall_bp": pa.array([recall_bp], pa.int64()),
            "n_query_sample": pa.array(
                [len(sample) if sample is not None else 0], pa.int64()
            ),
        }
    )


def semantic_dedup(
    ds: Dataset,
    threshold: float = 0.5,
    nlist: int = 32,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    **ivf_kwargs,
) -> Dataset:
    """SemDeDup-style embedding dedup: → (vec_id, rep_id, keep) for EVERY
    input vector.

    Pipeline: IVF-bucketed exact-cosine near-dup pairs (coarse k-means
    cells, nprobe multi-assignment so boundary pairs still meet;
    candidate-bounded verification) → connected components over the pair
    graph → the min-id member of each component becomes the
    representative; every other member is marked ``keep = 0``. Vectors
    with no near-dup are their own representative.

    Scale shape: pair generation is the audited ivf_bucketed_neardup path
    (id-only shuffles, cap-metered cells); components via the auto
    driver/hash-min union-find; the node→rep attachment is an
    attach_lookup (broadcast under the limit, hash join above) — nothing
    driver-resident grows with the corpus except the (near-dup nodes)
    label table, which the join tier handles at scale.

    Non-SQL-expressible (iterative CC) → rows-only driver check; the
    correctness gate lives in tests/test_round3b.py against a brute-force
    exact reference.
    """
    from quichash_ray.stages.lookup import attach_lookup
    from quichash_ray.stages.unionfind import connected_components

    pairs = ivf_bucketed_neardup(
        ds,
        threshold,
        nlist=nlist,
        nprobe=nprobe,
        id_col=id_col,
        emb_col=emb_col,
        **ivf_kwargs,
    )

    def to_edges(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64())}
            )
        return pa.table({"id_a": b[f"{id_col}_a"], "id_b": b[f"{id_col}_b"]})

    comps = connected_components(
        pairs.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    ).materialize()  # (node, cluster_id), near-dup nodes only

    reps = comps.groupby("cluster_id").min("node")
    labeled = attach_lookup(
        comps, reps, key_col="cluster_id", value_col="min(node)",
        out_col="rep_id",
    )
    out = attach_lookup(
        ds.select_columns([id_col]),
        labeled,
        key_col=id_col,
        key_col_in_mapping="node",
        value_col="rep_id",
        default=-1,
    )

    def finalize(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col], dtype=np.int64)
        rep = np.asarray(b["rep_id"], dtype=np.int64)
        rep = np.where(rep < 0, ids, rep)  # singletons: own representative
        return pa.table(
            {
                id_col: b[id_col],
                "rep_id": pa.array(rep, pa.int64()),
                "keep": pa.array((rep == ids).astype(np.int64)),
            }
        )

    return out.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def semantic_dedup_report(
    ds: Dataset,
    threshold: float = 0.5,
    nlist: int = 32,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    **ivf_kwargs,
) -> Dataset:
    """:func:`semantic_dedup` with its exact-reference agreement carried in
    the output: the same (vec_id, rep_id, keep) rows plus a constant
    ``agreement_bp`` column — the share of vectors whose rep_id matches a
    brute-force pipeline (exact cosine pairs → exact union-find → min-id
    rep), in basis points. Makes the driver's rows-only record
    correctness-bearing; the pytest gate holds agreement ≥ 9500.

    Cost shape: the exact side reuses :func:`cosine_neardup_pairs`
    (blocked O(n²) scan — a report tool, keep it at benchmark scale, like
    :func:`embedding_recall_report`); its pair list is near-dup-bounded so
    the driver union-find is small, and the per-vector comparison streams
    with one broadcast of the sorted (node, rep) arrays.
    """
    import ray

    from quichash_ray.stages.broadcast import cached_get
    from quichash_ray.stages.unionfind import driver_union_find

    out = semantic_dedup(
        ds, threshold, nlist=nlist, nprobe=nprobe,
        id_col=id_col, emb_col=emb_col, **ivf_kwargs,
    ).materialize()  # consumed twice: agreement pass + output

    exact = cosine_neardup_pairs(
        ds, threshold, id_col=id_col, emb_col=emb_col
    ).to_pandas()  # bounded by the exact near-dup pair count
    root = driver_union_find(
        list(zip(exact[f"{id_col}_a"], exact[f"{id_col}_b"]))
    )
    comp_min: dict[int, int] = {}
    for n, r in root.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    items = sorted((n, comp_min[r]) for n, r in root.items())
    nodes = np.array([i[0] for i in items], np.int64)
    reps = np.array([i[1] for i in items], np.int64)
    ref = ray.put((nodes, reps))

    def agree_partial(b: pa.Table) -> pa.Table:
        nd, rp = cached_get(ref)
        ids = np.asarray(b[id_col], np.int64)
        got_rep = np.asarray(b["rep_id"], np.int64)
        if len(nd) and len(ids):
            pos = np.clip(np.searchsorted(nd, ids), 0, len(nd) - 1)
            want = np.where(nd[pos] == ids, rp[pos], ids)
        else:
            want = ids
        return pa.table(
            {
                "match": pa.array([int((want == got_rep).sum())], pa.int64()),
                "total": pa.array([len(ids)], pa.int64()),
            }
        )

    parts = out.map_batches(
        agree_partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).to_pandas()
    total = int(parts["total"].sum())
    bp = (10000 * int(parts["match"].sum())) // total if total else 10000

    def attach(b: pa.Table) -> pa.Table:
        return b.append_column(
            "agreement_bp", pa.array(np.full(b.num_rows, bp, np.int64))
        )

    return out.map_batches(
        attach, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
