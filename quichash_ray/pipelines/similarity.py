"""Similarity search over an embedding column (list<float>).

Brute-force cosine is the exactness baseline: the query-side matrix is tiny,
so it is broadcast once via ``ray.put`` and every ``map_batches`` task streams
its batch through one numpy matmul — no shuffle at all. Per-batch partial
top-k keeps only ``k`` candidates per query per batch; the final exact top-k
is a single small ``groupby(query_id).map_groups``.

The scale path (replaces the data-side scan at 10^9+ vectors) is
``lsh_bucketed_neardup``: random-hyperplane signatures bucket the vectors via
a groupby shuffle so only same-bucket pairs are compared — same machinery as
the SimHash text stage.
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
    import ray

    qset = set(query_ids)
    q_rows = ds.filter(
        lambda r: r[id_col] in qset, concurrency=2
    ).take_all()
    q_rows.sort(key=lambda r: r[id_col])
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[emb_col] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids, qm = ray.get(q_ref)
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
        partial_topk, batch_format="pyarrow", zero_copy_batch=True
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
    a_limit: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> Dataset:
    """Embedding near-dup pairs: (a, b) with a < b, a < a_limit and
    cosine(a, b) >= threshold → (vec_id_a, vec_id_b).

    The a-side block (ids < a_limit) is broadcast; the b-side streams. At
    full scale a_limit-blocking becomes the outer loop of a blocked
    self-join, or use ``lsh_bucketed_neardup``.
    """
    import ray

    a_rows = ds.filter(lambda r: r[id_col] < a_limit, concurrency=2).take_all()
    a_rows.sort(key=lambda r: r[id_col])
    a_ids = np.array([r[id_col] for r in a_rows], dtype=np.int64)
    a_mat = np.array([r[emb_col] for r in a_rows], dtype=np.float64)
    a_mat /= np.linalg.norm(a_mat, axis=1, keepdims=True)
    a_ref = ray.put((a_ids, a_mat))

    def find_pairs(batch: pa.Table) -> pa.Table:
        ids_a, am = ray.get(a_ref)
        vecs = _emb_matrix(batch, emb_col)
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = am @ vecs.T  # (a, n)
        vids = np.asarray(batch[id_col], dtype=np.int64)
        hit_a, hit_b = np.nonzero(
            (sims >= threshold) & (ids_a[:, None] < vids[None, :])
        )
        return pa.table(
            {
                "vec_id_a": pa.array(ids_a[hit_a], pa.int64()),
                "vec_id_b": pa.array(vids[hit_b], pa.int64()),
            }
        )

    return ds.map_batches(
        find_pairs, batch_format="pyarrow", zero_copy_batch=True
    )


def lsh_bucketed_neardup(
    ds: Dataset,
    threshold: float,
    num_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    bucket_cap: int = 2048,
) -> Dataset:
    """Scale path: random-hyperplane LSH bucketing, then exact cosine inside
    buckets only. Recall < 1 (pairs split across buckets are missed) — the
    standard trade; raise num_planes bands or repeat with different seeds for
    higher recall. → (vec_id_a, vec_id_b), a < b, deduplicated.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        vecs = _emb_matrix(batch, emb_col)
        rng = np.random.Generator(np.random.Philox(key=[seed, 0]))
        planes = rng.standard_normal((vecs.shape[1], num_planes))
        bits = (vecs @ planes) >= 0
        bucket = np.zeros(len(vecs), dtype=np.int64)
        for j in range(num_planes):
            bucket = (bucket << 1) | bits[:, j]
        return pa.table(
            {
                id_col: batch[id_col],
                emb_col: batch[emb_col],
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    bucketed = ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": []}).astype(
                {"vec_id_a": np.int64, "vec_id_b": np.int64}
            )
        g = g.sort_values(id_col).head(bucket_cap)
        m = np.array(g[emb_col].tolist(), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T
        ids = g[id_col].to_numpy()
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {"vec_id_a": ids[ia].astype(np.int64), "vec_id_b": ids[ib].astype(np.int64)}
        )

    return bucketed.groupby("bucket").map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
