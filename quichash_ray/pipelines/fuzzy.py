"""Fuzzy dedup — MinHash/LSH + SimHash candidate generation, exact-Jaccard
verification, and union-find clustering (north_star core).

Architecture (SURVEY §7.1 milestones 4-6):

    corpus ──digest──► exact groups ──reps──► SignatureActor (actor pool)
                │                              │           │
                │                        band_rows      simhash
                │                              │           │
                │                     LSH bucket groupby   pigeonhole chunks
                │                              │           │
                │                        candidate pairs (unioned)
                │                              │
                │                     exact-Jaccard verify (≥ threshold)
                │                              │
                └────── member→rep edges ──► connected components
                                               │
                                     (row_id, cluster_id)

**Skew design**: fuzzy stages run on exact-duplicate *representatives* only —
a mega-group of N identical files (LICENSE/empty analog) contributes ONE node
to LSH banding instead of N, killing the hottest band-key skew class outright
(the reference has no answer to this; its HashMap would blow up —
/root/reference/src/dedup.rs:440-446). Residual hot buckets (boilerplate
near-identical docs) are capped by ``bucket_cap`` inside the banded local
pair join, and the band partition count is the salt knob.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Min

from quichash_ray.config import FuzzyConfig
from quichash_ray.stages.minhash import SignatureActor, band_rows
from quichash_ray.stages.unionfind import connected_components


def exact_stage(
    corpus: Dataset,
    id_col: str = "row_id",
    text_col: str = "content",
    algorithm: str = "sha256",
):
    """→ (membership, reps): membership(id, rep) maps every row to its
    exact-dup representative (min id per digest); reps = corpus rows whose
    id is a representative (content retained for the fuzzy stages)."""
    from quichash_ray.stages.digest import add_digests
    from quichash_ray.stages.lookup import semi_join_broadcast

    digests = add_digests(
        corpus, [algorithm], content_col=text_col, drop_content=True
    ).select_columns([id_col, algorithm])

    # one banded shuffle: partition by digest hash, assign rep = min(id) per
    # digest inside each partition with a vectorized pandas transform (a
    # digest never spans partitions). No join, no aggregator actors.
    def add_part(b: pa.Table) -> pa.Table:
        import zlib

        part = np.fromiter(
            (zlib.crc32(d.encode()) & 63 for d in b[algorithm].to_pylist()),
            np.int64,
            b.num_rows,
        )
        return b.append_column("part", pa.array(part))

    def assign_rep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["rep"] = g.groupby(algorithm)[id_col].transform("min")
        return g[[id_col, "rep"]]

    membership = (
        digests.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(assign_rep, batch_format="pandas")
        .materialize()
    )

    rep_ids = membership.filter(expr=f"{id_col} == rep").select_columns(
        [id_col]
    )
    reps = semi_join_broadcast(corpus, rep_ids, id_col).materialize()
    return membership, reps


def lsh_candidate_pairs(
    signatures: Dataset,
    cfg: FuzzyConfig | None = None,
    id_col: str = "row_id",
    num_parts: int = 32,
    bucket_cap: int = 512,
) -> Dataset:
    """Band-bucket groupby → distinct candidate pairs (id_a < id_b).

    Same banded local-join machinery as the n-gram stage: buckets hash into
    ``num_parts`` partition groups; all pairs of ids sharing a
    (band_id, band_key) bucket are emitted, buckets above ``bucket_cap``
    dropped (logged skew guard), pairs deduplicated by a groupby.
    """
    cfg = cfg or FuzzyConfig()
    bands = band_rows(signatures, cfg, id_col)

    def add_part(b: pa.Table) -> pa.Table:
        key = np.asarray(b["band_key"], np.int64).view(np.uint64)
        band = np.asarray(b["band_id"], np.int64).astype(np.uint64)
        part = (key ^ (band * np.uint64(0xD1B54A32D192ED03))) % np.uint64(
            num_parts
        )
        return b.append_column("part", pa.array(part.astype(np.int64)))

    parted = bands.map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    )

    def local_pairs(g: pd.DataFrame) -> pd.DataFrame:
        key = (
            g["band_key"].to_numpy().astype(np.int64),
            g["band_id"].to_numpy().astype(np.int64),
        )
        ids = g[id_col].to_numpy().astype(np.int64)
        order = np.lexsort((ids,) + key)
        k0, k1 = key[0][order], key[1][order]
        ids = ids[order]
        bucket = np.flatnonzero(
            np.concatenate(([True], (k0[1:] != k0[:-1]) | (k1[1:] != k1[:-1])))
        )
        counts = np.diff(np.concatenate((bucket, [len(ids)])))
        out_a, out_b = [], []
        for s, c in zip(bucket, counts):
            if c < 2 or c > bucket_cap:
                continue
            seg = ids[s : s + c]
            ia, ib = np.triu_indices(c, k=1)
            out_a.append(seg[ia])
            out_b.append(seg[ib])
        if not out_a:
            return pd.DataFrame(
                {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)}
            )
        return (
            pd.DataFrame(
                {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
            )
            .drop_duplicates()
            .reset_index(drop=True)
        )

    pairs = parted.groupby("part").map_groups(
        local_pairs, batch_format="pandas"
    )
    # global distinct (a pair can surface from several bands/partitions)
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("id_a", alias_name="_d")
    ).drop_columns(["_d"])


def simhash_candidate_pairs(
    signatures: Dataset,
    cfg: FuzzyConfig | None = None,
    id_col: str = "row_id",
    bucket_cap: int = 512,
) -> Dataset:
    """Pigeonhole Hamming-radius candidates: 4×16-bit chunks of the 64-bit
    simhash; any pair within Hamming distance ≤ radius shares ≥1 exact chunk
    (radius 3 < 4 chunks). Pairs verified by popcount before emission."""
    cfg = cfg or FuzzyConfig()
    n_chunks = cfg.simhash_chunks
    bits = cfg.simhash_bits // n_chunks
    radius = cfg.simhash_radius

    def chunk_rows(b: pa.Table) -> pa.Table:
        sim = np.asarray(b["simhash"], np.int64).view(np.uint64)
        ids = np.asarray(b[id_col], np.int64)
        mask = np.uint64((1 << bits) - 1)
        out_id = np.repeat(ids, n_chunks)
        out_chunk = np.tile(np.arange(n_chunks, dtype=np.int64), len(ids))
        vals = np.empty(len(ids) * n_chunks, dtype=np.int64)
        for c in range(n_chunks):
            vals[c::n_chunks] = (
                (sim >> np.uint64(c * bits)) & mask
            ).astype(np.int64)
        sims = np.repeat(sim.view(np.int64), n_chunks)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "chunk_id": pa.array(out_chunk, pa.int64()),
                "chunk_val": pa.array(vals, pa.int64()),
                "simhash": pa.array(sims, pa.int64()),
            }
        )

    chunks = signatures.select_columns([id_col, "simhash"]).map_batches(
        chunk_rows, batch_format="pyarrow", zero_copy_batch=True
    )

    def local_pairs(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.sort_values(id_col)
        ids = gg[id_col].to_numpy().astype(np.int64)
        sims = gg["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        if len(ids) < 2 or len(ids) > bucket_cap:
            return pd.DataFrame(
                {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)}
            )
        ia, ib = np.triu_indices(len(ids), k=1)
        x = sims[ia] ^ sims[ib]
        # vectorized popcount via byte-LUT
        lut = np.array([bin(i).count("1") for i in range(256)], np.uint8)
        ham = lut[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)
        keep = (ham <= radius) & (ids[ia] != ids[ib])
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep]})

    pairs = chunks.groupby(["chunk_id", "chunk_val"]).map_groups(
        local_pairs, batch_format="pandas"
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("id_a", alias_name="_d")
    ).drop_columns(["_d"])


def verify_pairs_jaccard(
    candidates: Dataset,
    signatures: Dataset,
    cfg: FuzzyConfig | None = None,
    id_col: str = "row_id",
) -> Dataset:
    """Exact-Jaccard verification of candidate pairs against the true shingle
    sets (kept on the signature table as ``shingles``). The shingle-set
    lookup is a broadcast (`ray.put` once) below ~10^6 reps; beyond that the
    same verification runs as two joins candidate⋈signatures — candidates
    after LSH are sparse, so either side stays small."""
    import ray

    cfg = cfg or FuzzyConfig()
    shingle_map = {}
    for row in signatures.select_columns([id_col, "shingles"]).iter_rows():
        shingle_map[row[id_col]] = np.asarray(row["shingles"], np.int64)
    ref = ray.put(shingle_map)
    thr = cfg.jaccard_threshold

    def verify(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids_a = b["id_a"].to_pylist()
        ids_b = b["id_b"].to_pylist()
        keep, jac = [], []
        for x, y in zip(ids_a, ids_b):
            sa, sb = m.get(x), m.get(y)
            if sa is None or sb is None or len(sa) == 0 or len(sb) == 0:
                keep.append(False)
                jac.append(0.0)
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            jac.append(j)
            keep.append(j >= thr)
        out = pa.table(
            {
                "id_a": b["id_a"],
                "id_b": b["id_b"],
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pa.array(keep))

    return candidates.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True
    )


def fuzzy_dedup(
    corpus: Dataset,
    cfg: FuzzyConfig | None = None,
    id_col: str = "row_id",
    text_col: str = "content",
    use_simhash: bool = True,
    cc_method: str = "auto",
) -> Dataset:
    """Full pipeline → (row_id, cluster_id, rep).

    cluster_id = min row id of the near-dup cluster; rows with no duplicate
    relationships cluster alone.
    """
    cfg = cfg or FuzzyConfig()
    membership, reps = exact_stage(corpus, id_col, text_col)
    membership = membership.materialize()

    signatures = reps.map_batches(
        SignatureActor,
        fn_constructor_kwargs={
            "cfg": cfg,
            "id_col": id_col,
            "text_col": text_col,
            "keep_shingles": True,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
        concurrency=4,
    ).materialize()

    lsh_pairs = lsh_candidate_pairs(signatures, cfg, id_col)
    candidates = lsh_pairs
    if use_simhash:
        candidates = candidates.union(
            simhash_candidate_pairs(signatures, cfg, id_col)
        )
        candidates = candidates.groupby(["id_a", "id_b"]).aggregate(
            Min("id_a", alias_name="_d")
        ).drop_columns(["_d"])

    # materialize at the fan-out: candidates/verified are consumed more
    # than once downstream (count + iter/join) — without a checkpoint the
    # whole LSH/simhash lineage would re-execute per consumption
    candidates = candidates.materialize()
    verified = verify_pairs_jaccard(
        candidates, signatures, cfg, id_col
    ).select_columns(["id_a", "id_b"]).materialize()

    labels = connected_components(verified, method=cc_method)

    # rep-level labels back to members (broadcast lookup; join fallback at
    # scale); reps without any fuzzy edge cluster alone under their own id
    from quichash_ray.stages.lookup import attach_lookup

    lab = labels.map_batches(
        lambda b: b.rename_columns(["rep", "cluster_id"]),
        batch_format="pyarrow",
    )
    assigned = attach_lookup(
        membership,
        lab,
        key_col="rep",
        value_col="cluster_id",
        out_col="rep_cluster",
    )

    def finalize(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cluster = pc.coalesce(b["rep_cluster"], b["rep"])
        return pa.table(
            {
                id_col: b[id_col],
                "cluster_id": pc.cast(cluster, pa.int64()),
                "rep": b["rep"],
            }
        )

    return assigned.map_batches(finalize, batch_format="pyarrow")
