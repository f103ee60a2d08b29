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

import os

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Min

from quichash_ray.config import FuzzyConfig
from quichash_ray.stages.minhash import SignatureActor, make_signature_fn
from quichash_ray.stages.unionfind import connected_components


def exact_stage(
    corpus: Dataset,
    id_col: str = "row_id",
    text_col: str = "content",
    algorithm: str = "sha256",
    num_parts: int | None = None,
    n_rows: int | None = None,
):
    """→ (membership, reps): membership(id, rep) maps every row to its
    exact-dup representative (min id per digest); reps = corpus rows whose
    id is a representative (content retained for the fuzzy stages).

    Null-content rows keep a membership row with ``rep = row_id`` (singleton
    cluster) — skip-and-count discipline without silently dropping ids.
    Pass ``n_rows`` when known to avoid a ``count()`` that would re-execute
    a lazy (non-read) corpus plan.
    """
    from quichash_ray.stages.digest import add_digests
    from quichash_ray.stages.lookup import semi_join_broadcast
    from quichash_ray.stages.partitioning import choose_num_parts

    if num_parts is None:
        # ~90B/row through the shuffle (id + hex digest + part)
        num_parts = choose_num_parts(
            n_rows if n_rows is not None else corpus.count(),
            bytes_per_row=90,
            target_bytes=32 << 20,
        )

    digests = add_digests(
        corpus,
        [algorithm],
        content_col=text_col,
        drop_content=True,
        prefix_col="_dp",
    ).select_columns([id_col, algorithm, "_dp"])

    # one banded shuffle: partition by digest prefix (int64 emitted by the
    # digest kernel — no per-row re-hash here), assign rep = min(id) per
    # digest inside each partition with a vectorized pandas transform (a
    # digest never spans partitions). No join, no aggregator actors.
    mult = np.uint64(0x9E3779B97F4A7C15)

    def add_part(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        valid = pc.is_valid(b[algorithm])
        dig = b[algorithm]
        dp = b["_dp"]
        if not pc.all(valid).as_py():
            # null digest (null content): a per-row unique pseudo-digest
            # makes the row its own singleton group ("null:" can never
            # collide with a hex digest)
            dig = pc.if_else(
                valid,
                dig,
                pc.binary_join_element_wise(
                    "null:", pc.cast(b[id_col], pa.string()), ""
                ),
            )
            dp = pc.if_else(valid, dp, b[id_col])
        part = (
            (np.asarray(dp, dtype=np.int64).view(np.uint64) * mult)
            >> np.uint64(40)
        ) % np.uint64(num_parts)
        return pa.table(
            {
                id_col: b[id_col],
                algorithm: dig,
                "part": pa.array(part.astype(np.int64)),
            }
        )

    def assign_rep(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "rep": pa.array([], pa.int64())}
            )
        df = g.to_pandas()
        rep = df.groupby(algorithm)[id_col].transform("min")
        return pa.table(
            {
                id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
                "rep": pa.array(rep.to_numpy(), pa.int64()),
            }
        )

    from quichash_ray.stages.exchange import hash_exchange

    membership = hash_exchange(
        digests.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "part",
        assign_rep,
        num_parts,
    ).materialize()

    rep_ids = membership.filter(expr=f"{id_col} == rep").select_columns(
        [id_col]
    )
    # the broadcast filter is actor-free, so it fuses into the downstream
    # signature actor-pool execution without a barrier
    reps = semi_join_broadcast(corpus, rep_ids, id_col)
    return membership, reps


def combined_candidate_pairs(
    signatures: Dataset,
    cfg: FuzzyConfig | None = None,
    id_col: str = "row_id",
    num_parts: int | None = None,
    bucket_cap: int = 512,
    use_simhash: bool = True,
) -> Dataset:
    """LSH band buckets AND SimHash pigeonhole buckets in ONE shuffle.

    Bucket rows carry (id, key, simhash): ``key`` is a 64-bit hash mixing
    (kind, k1, k2) with the kind bit — LSH band (k1=band_id, k2=band_key) vs
    simhash chunk (k1=chunk_id, k2=chunk_val) — packed into its low bit. One
    hash-partitioned groupby then segments each bucket locally — halves the
    AllToAll count vs running the two stages apart, and the packed key keeps
    the shuffle rows at 4 int64 columns.

    Buckets larger than ``bucket_cap`` are dropped (boilerplate quadratic
    guard); every drop is counted on the metrics actor under
    ``lsh_dropped_buckets`` / ``lsh_dropped_bucket_rows`` — no silent caps.
    """
    cfg = cfg or FuzzyConfig()
    if num_parts is None:
        from quichash_ray.stages.partitioning import dataset_num_parts

        # (b + chunks) bucket rows per signature row, 32B each through the
        # shuffle; smaller groups = more local-join parallelism
        num_parts = dataset_num_parts(
            signatures,
            bytes_per_row=(cfg.lsh_bands + cfg.simhash_chunks) * 32,
            target_bytes=32 << 20,
            min_parts=32,
        )
    from quichash_ray.state.metrics import get_metrics_actor

    metrics = get_metrics_actor()
    b_, r_ = cfg.lsh_bands, cfg.lsh_rows
    n_chunks = cfg.simhash_chunks
    bits = cfg.simhash_bits // n_chunks
    radius = cfg.simhash_radius
    mult = np.uint64(0x9E3779B97F4A7C15)

    def bucket_rows(batch: pa.Table) -> pa.Table:
        # docs with zero shingles (< k tokens) all share the identity
        # signature — banding them makes every short-doc pair a candidate
        # in every band; they can only be exact dups, which the exact stage
        # already handled, so exclude them here
        nsh = batch["n_shingles"]
        if isinstance(nsh, pa.ChunkedArray):
            nsh = nsh.combine_chunks()
        batch = batch.filter(pa.compute.greater(nsh, 0))
        mh = batch["minhash"]
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.combine_chunks()
        n = len(mh)
        sig = (
            np.asarray(mh.flatten(), dtype=np.int64)
            .view(np.uint64)
            .reshape(n, b_ * r_)
        )
        ids = np.asarray(batch[id_col], dtype=np.int64)
        sims = np.asarray(batch["simhash"], np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            keys = np.zeros((n, b_), dtype=np.uint64)
            for band in range(b_):
                h = np.full(n, np.uint64(band * 2 + 1), np.uint64)
                for j in range(r_):
                    h = (h * mult) ^ sig[:, band * r_ + j]
                keys[:, band] = h * mult
        out_id = [np.repeat(ids, b_)]
        out_kind = [np.zeros(n * b_, np.int64)]
        out_k1 = [np.tile(np.arange(b_, dtype=np.int64), n)]
        out_k2 = [keys.reshape(-1).view(np.int64)]
        out_sim = [np.zeros(n * b_, np.int64)]
        if use_simhash:
            mask = np.uint64((1 << bits) - 1)
            out_id.append(np.repeat(ids, n_chunks))
            out_kind.append(np.ones(n * n_chunks, np.int64))
            out_k1.append(np.tile(np.arange(n_chunks, dtype=np.int64), n))
            vals = np.empty(n * n_chunks, dtype=np.int64)
            for c in range(n_chunks):
                vals[c::n_chunks] = (
                    (sims >> np.uint64(c * bits)) & mask
                ).astype(np.int64)
            out_k2.append(vals)
            out_sim.append(np.repeat(sims.view(np.int64), n_chunks))
        # pack (kind, k1, k2) into one 64-bit bucket key with the kind in
        # the LOW BIT — narrower shuffle rows (no separate kind column) and
        # a single-column sort key in the local join
        kindv = np.concatenate(out_kind).astype(np.uint64)
        k1v = np.concatenate(out_k1).astype(np.uint64)
        k2v = np.concatenate(out_k2).view(np.uint64)
        with np.errstate(over="ignore"):
            key = (
                (k2v * mult)
                ^ (k1v * np.uint64(0xD1B54A32D192ED03))
                ^ (kindv * np.uint64(0xEB44ACCAB455D165))
            )
        key = (key & ~np.uint64(1)) | kindv
        part = key % np.uint64(num_parts)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "key": pa.array(key.view(np.int64), pa.int64()),
                "simhash": pa.array(np.concatenate(out_sim), pa.int64()),
                "part": pa.array(part.astype(np.int64)),
            }
        )

    bucketed = signatures.select_columns(
        [id_col, "minhash", "simhash", "n_shingles"]
    ).map_batches(bucket_rows, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    _LUT = np.array([bin(i).count("1") for i in range(256)], np.uint8)

    def local_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        ids = np.asarray(g[id_col], dtype=np.int64)
        key = np.asarray(g["key"], dtype=np.int64)
        sims = np.asarray(g["simhash"], dtype=np.int64).view(np.uint64)
        order = np.lexsort((ids, key))
        ids, key, sims = ids[order], key[order], sims[order]
        kind = key & 1  # packed kind bit
        starts = np.flatnonzero(
            np.concatenate(([True], key[1:] != key[:-1]))
        )
        counts = np.diff(np.concatenate((starts, [len(ids)])))
        over_cap = counts > bucket_cap
        if over_cap.any():
            # no silent caps: report dropped buckets + their row volume
            metrics.add.remote("lsh_dropped_buckets", int(over_cap.sum()))
            metrics.add.remote(
                "lsh_dropped_bucket_rows", int(counts[over_cap].sum())
            )
        out_a, out_b = [], []
        for s, c in zip(starts, counts):
            if c < 2 or c > bucket_cap:
                continue
            seg_ids = ids[s : s + c]
            ia, ib = np.triu_indices(c, k=1)
            if kind[s] == 0:
                keep = seg_ids[ia] != seg_ids[ib]
            else:
                seg_sims = sims[s : s + c]
                x = seg_sims[ia] ^ seg_sims[ib]
                ham = _LUT[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)
                keep = (ham <= radius) & (seg_ids[ia] != seg_ids[ib])
            out_a.append(seg_ids[ia][keep])
            out_b.append(seg_ids[ib][keep])
        if not out_a:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        uniq = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table(
            {
                "id_a": pa.array(uniq[:, 0], pa.int64()),
                "id_b": pa.array(uniq[:, 1], pa.int64()),
            }
        )

    from quichash_ray.stages.exchange import hash_exchange

    pairs = hash_exchange(bucketed, "part", local_pairs, num_parts)

    # global distinct: a near-dup pair surfaces from up to b bands landing in
    # different partitions; at large candidate counts one int-pair shuffle is
    # cheaper than 4-16x redundant verification downstream. Banded again: a
    # pair hashes to exactly one partition, dedup is a vectorized unique per
    # partition.
    def pair_part(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"], np.int64).view(np.uint64)
        bb = np.asarray(b["id_b"], np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            part = ((a * mult) ^ (bb * np.uint64(0xD1B54A32D192ED03))) % (
                np.uint64(num_parts)
            )
        return b.append_column("dpart", pa.array(part.astype(np.int64)))

    def drop_dups(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        a = np.asarray(g["id_a"], np.int64)
        b = np.asarray(g["id_b"], np.int64)
        uniq = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table(
            {
                "id_a": pa.array(uniq[:, 0], pa.int64()),
                "id_b": pa.array(uniq[:, 1], pa.int64()),
            }
        )

    return hash_exchange(
        pairs.map_batches(pair_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "dpart",
        drop_dups,
        num_parts,
    )


def verify_pairs_jaccard(
    candidates: Dataset,
    signatures: Dataset,
    cfg: FuzzyConfig | None = None,
    id_col: str = "row_id",
    content: Dataset | None = None,
    text_col: str = "content",
) -> Dataset:
    """Exact-Jaccard verification of candidate pairs against the true shingle
    sets (kept on the signature table as ``shingles``). The shingle-set
    lookup is a broadcast (`ray.put` once) below ~10^6 reps; beyond that the
    same verification runs as two joins candidate⋈signatures — candidates
    after LSH are sparse, so either side stays small."""
    import os
    import time as _time

    import ray

    _prof = bool(os.environ.get("QUICHASH_PROFILE"))
    _t0 = _time.time()

    def _mark(label: str) -> None:
        nonlocal _t0
        if _prof:
            print(
                f"[verify-profile] {label}: {_time.time() - _t0:.2f}s",
                flush=True,
            )
            _t0 = _time.time()

    cfg = cfg or FuzzyConfig()
    # pull shingle sets ONLY for ids that occur in candidate pairs — the
    # broadcast scales with the candidate set (sparse after LSH), not the
    # corpus. Candidate-id collection runs as remote per-block uniques; the
    # driver merges ids-only arrays.
    from quichash_ray.stages.pairverify import collect_pair_ids, make_id_filter

    candidates = candidates.materialize()
    _mark(f"candidates_materialize({candidates.count()})")
    id_arr = collect_pair_ids(candidates)
    id_ref = ray.put(id_arr)
    _mark(f"cand_ids({len(id_arr)})")

    filter_sigs = make_id_filter(id_ref, id_col)

    # assemble flat CSR-style lookups (sorted ids, offsets, values) in K
    # id-hash shards, each built by a REMOTE task over the materialized
    # blocks — the driver never touches shingle bytes, the build
    # parallelizes, and same-node ray.get of the numpy shards is zero-copy
    # from plasma
    id_chunks: list[np.ndarray] = []
    val_chunks: list[np.ndarray] = []
    len_chunks: list[np.ndarray] = []
    if content is not None:
        # recompute shingles for candidate ids straight from content — avoids
        # materializing a corpus-wide shingle column on the signature table
        from quichash_ray.stages.pairverify import make_shingle_recompute_fn

        filtered = content.select_columns([id_col, text_col]).map_batches(
            make_shingle_recompute_fn(id_ref, id_col, text_col, cfg.shingle_k),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        filtered = signatures.select_columns([id_col, "shingles"]).map_batches(
            filter_sigs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    # shard count scales with the session's CPUs: the shard builds are the
    # only tasks running at this point in the chain (round-1's fixed 8 was
    # the measured non-scaling stage)
    n_shards = max(8, int(ray.cluster_resources().get("CPU", 8)))
    filtered = filtered.materialize()
    block_refs = filtered.to_arrow_refs()

    @ray.remote
    def build_shard(shard: int, refs: list):
        import ray as _ray

        from quichash_ray.stages.pairverify import shingle_col_to_csr

        tables = _ray.get(refs)
        ids_c, vals_c, lens_c = [], [], []
        for t in tables:
            if t.num_rows == 0:
                continue
            ids = np.asarray(t[id_col], dtype=np.int64)
            vals, offs = shingle_col_to_csr(t["shingles"])
            vals = vals.view(np.int64)
            lens = np.diff(offs)
            mask = (ids % n_shards) == shard
            if not mask.any():
                continue
            sel = np.flatnonzero(mask)
            ids_c.append(ids[sel])
            lens_sel = lens[sel]
            lens_c.append(lens_sel)
            total = int(lens_sel.sum())
            if total:
                ns = np.concatenate(([0], np.cumsum(lens_sel)))[:-1]
                within = np.arange(total) - np.repeat(ns, lens_sel)
                idx = np.repeat(offs[:-1][sel], lens_sel) + within
                vals_c.append(vals[idx])
        if not ids_c:
            return (
                np.empty(0, np.int64),
                np.zeros(1, np.int64),
                np.empty(0, np.int64),
            )
        all_ids = np.concatenate(ids_c)
        all_lens = np.concatenate(lens_c)
        all_vals = np.concatenate(vals_c) if vals_c else np.empty(0, np.int64)
        order = np.argsort(all_ids, kind="stable")
        starts = np.concatenate(([0], np.cumsum(all_lens)))[:-1]
        lens_o = all_lens[order]
        new_starts = np.concatenate(([0], np.cumsum(lens_o)))[:-1]
        total = int(lens_o.sum())
        if total:
            within = np.arange(total) - np.repeat(new_starts, lens_o)
            idx = np.repeat(starts[order], lens_o) + within
            sorted_vals = all_vals[idx]
        else:
            sorted_vals = np.empty(0, np.int64)
        return (
            all_ids[order],
            np.concatenate(([0], np.cumsum(lens_o))),
            sorted_vals,
        )

    shard_refs = [
        build_shard.remote(s, block_refs) for s in range(n_shards)
    ]
    _mark(f"shingle_shards_launched({len(id_arr)})")
    thr = cfg.jaccard_threshold

    def verify(b: pa.Table) -> pa.Table:
        from quichash_ray.stages.broadcast import cached_get

        # zero-copy plasma views, got once per worker (per-batch re-gets
        # are one raylet IPC per shard per batch — measured kernel-side
        # churn; see stages/broadcast.py). Bounded by candidate ids.
        shards = [cached_get(r) for r in shard_refs]
        ids_a = np.asarray(b["id_a"], dtype=np.int64)
        ids_b = np.asarray(b["id_b"], dtype=np.int64)
        # batch-local dedup: a near-dup pair surfaces from up to b bands;
        # duplicates surviving across batches are harmless (CC idempotent)
        pairs_arr = np.stack([ids_a, ids_b], axis=1)
        pairs_arr = np.unique(pairs_arr, axis=0)
        ids_a, ids_b = pairs_arr[:, 0], pairs_arr[:, 1]

        def lookup(x: int):
            ids_m, offs_m, vals_m = shards[x % n_shards]
            p = np.searchsorted(ids_m, x)
            if p >= len(ids_m) or ids_m[p] != x:
                return None
            return vals_m[offs_m[p] : offs_m[p + 1]]

        keep = np.zeros(len(ids_a), dtype=bool)
        jac = np.zeros(len(ids_a), dtype=np.float64)
        for i in range(len(ids_a)):
            sa = lookup(int(ids_a[i]))
            sb = lookup(int(ids_b[i]))
            if sa is None or sb is None or len(sa) == 0 or len(sb) == 0:
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            jac[i] = j
            keep[i] = j >= thr
        out = pa.table(
            {
                "id_a": pa.array(ids_a, pa.int64()),
                "id_b": pa.array(ids_b, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pa.array(keep))

    return candidates.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def fuzzy_dedup(
    corpus: Dataset,
    cfg: FuzzyConfig | None = None,
    id_col: str = "row_id",
    text_col: str = "content",
    use_simhash: bool = True,
    cc_method: str = "auto",
    verify_mode: str = "auto",
) -> Dataset:
    """Full pipeline → (row_id, cluster_id, rep).

    cluster_id = min row id of the near-dup cluster; rows with no duplicate
    relationships cluster alone.
    """
    import os
    import time as _time

    _prof = bool(os.environ.get("QUICHASH_PROFILE"))
    _t = [_time.time()]

    def _mark(label: str) -> None:
        if _prof:
            now = _time.time()
            print(f"[fuzzy-profile] {label}: {now - _t[0]:.2f}s", flush=True)
            _t[0] = now

    cfg = cfg or FuzzyConfig()
    # ONE count serves partition sizing and verify-mode choice (a lazy
    # non-read corpus would otherwise re-execute per count — round-1
    # lineage-re-execution pitfall; read_parquet counts from metadata)
    n_rows = corpus.count()
    # Fused content pass: at plasma-friendly sizes, decode the (id,
    # content) projection from parquet ONCE and let every content consumer
    # — the digest scan, the reps filter feeding the signature scan, and
    # the tier-2 shingle recompute — read the same plasma blocks
    # (zero-copy same-node gets). Round 2 decoded the content column from
    # parquet twice (digest scan + reps materialization), the top item in
    # the remaining DRAM-bound profile. Above the threshold (~10 GB of
    # content on this box) streaming re-decodes beat object-store spill,
    # so the large regime keeps the two-pass shape.
    # threshold env-tunable so the fused-vs-two-pass crossover can be
    # measured at any size (QUICHASH_FUSE_ROWS; BASELINE.md 8M protocol)
    fuse_rows = int(os.environ.get("QUICHASH_FUSE_ROWS", "5000000"))
    if n_rows <= fuse_rows:
        corpus = corpus.select_columns([id_col, text_col]).materialize()
    membership, reps = exact_stage(corpus, id_col, text_col, n_rows=n_rows)
    membership = membership.materialize()
    _mark("exact_stage")

    # stateless tasks with per-worker-process cached state: the permutation
    # table is cheap to build, so task scheduling on the warm worker pool
    # beats actor-pool spin-up; swap in SignatureActor via
    # map_batches(SignatureActor, concurrency=N) for heavy per-actor state.
    # Verification strategy: the co-partitioned two-tier verifier
    # (pairverify.py) moves binary-encoded signatures through banded
    # groupby shuffles — every stage scales with the candidate set. The
    # broadcast verifier is kept for small jobs (one CSR lookup, no
    # shuffle) and as the equivalence-test reference. Neither mode stores
    # shingles corpus-wide: tier-2 / exact verification recomputes them
    # from rep content for exactly the ids it needs.
    if verify_mode == "auto":
        verify_mode = "distributed" if n_rows > 100_000 else "broadcast"

    signatures = reps.map_batches(
        make_signature_fn(cfg, id_col, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
    ).materialize()
    _mark("signatures")

    candidates = combined_candidate_pairs(
        signatures, cfg, id_col, use_simhash=use_simhash
    )

    # verified is consumed more than once downstream (count + CC), so it
    # checkpoints; candidates flow straight into verification (consumed once)
    if verify_mode == "distributed":
        from quichash_ray.stages.pairverify import verify_pairs_distributed

        verified = verify_pairs_distributed(
            candidates.materialize(), signatures, cfg, id_col,
            content=reps, text_col=text_col,
        ).materialize()
    else:
        verified = verify_pairs_jaccard(
            candidates, signatures, cfg, id_col,
            content=reps, text_col=text_col,
        ).select_columns(["id_a", "id_b"]).materialize()
    _mark("candidates+verify")

    labels = connected_components(verified, method=cc_method)
    _mark("connected_components")

    # rep-level labels back to members (broadcast lookup; join fallback at
    # scale); reps without any fuzzy edge cluster alone under their own id
    from quichash_ray.stages.lookup import attach_lookup

    lab = labels.map_batches(
        lambda b: b.rename_columns(["rep", "cluster_id"]),
        batch_format="pyarrow", batch_size=None,
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

    return assigned.map_batches(finalize, batch_format="pyarrow", batch_size=None)


def attach_truth_recall(
    pred: Dataset, truth_path: str, id_col: str = "row_id"
) -> Dataset:
    """→ the same (row_id, cluster_id, rep) rows with a constant
    ``truth_recall_bp`` column: dup-pair recall of the predicted
    clustering against the planted-truth sidecar (10000 = every truth
    pair co-clustered) — the BASELINE.json dup-pair-recall criterion
    carried in the query output itself, so the driver's rows-only record
    is correctness-bearing rather than bare membership.

    Cost shape: the truth sidecar is bounded (planted clusters only);
    truth-member predicted labels are filtered out of the streamed
    prediction via one broadcast of the sorted truth-id array, and the
    recall is the vectorized pair identity Σ C(m,2) — no pair
    enumeration: required = Σ_truth-cluster C(sz,2), found =
    Σ_(truth-cluster × predicted-label) C(m,2).
    """
    import pyarrow.parquet as pq
    import ray

    from quichash_ray.stages.broadcast import cached_get

    truth = pq.read_table(truth_path).to_pandas()
    pred = pred.materialize()  # consumed twice: metric pass + output
    tids = np.sort(truth[id_col].to_numpy().astype(np.int64))
    ref = ray.put(tids)

    def member_rows(b: pa.Table) -> pa.Table:
        nodes = cached_get(ref)
        ids = np.asarray(b[id_col], np.int64)
        if len(nodes) == 0 or len(ids) == 0:
            mask = np.zeros(len(ids), bool)
        else:
            pos = np.clip(np.searchsorted(nodes, ids), 0, len(nodes) - 1)
            mask = nodes[pos] == ids
        return pa.table(
            {
                id_col: pa.array(ids[mask], pa.int64()),
                "cluster_id": pa.array(
                    np.asarray(b["cluster_id"], np.int64)[mask], pa.int64()
                ),
            }
        )

    sub = pred.map_batches(
        member_rows, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).to_pandas()  # truth-sized
    m = truth.merge(sub, on=id_col, suffixes=("_true", "_pred"))
    sz = m.groupby("cluster_id_true").size()
    required = int((sz * (sz - 1) // 2).sum())
    f = m.groupby(["cluster_id_true", "cluster_id_pred"]).size()
    found = int((f * (f - 1) // 2).sum())
    bp = (10000 * found) // required if required else 10000

    def attach(b: pa.Table) -> pa.Table:
        return b.append_column(
            "truth_recall_bp",
            pa.array(np.full(b.num_rows, bp, np.int64)),
        )

    return pred.map_batches(
        attach, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
