"""Repository-level near-duplicate detection (fork finding).

Source-code corpora at 10^12-file scale are dominated by *repo-level*
duplication — forks, vendored copies, mirrors — before file-level dups
(the reference dedups at file granularity only, dedup.rs:540-620; this
stage generalizes the same digest-set machinery one level up, a core
need of the training-data mandate).

Semantics: two repos are near-duplicates when the Jaccard similarity of
their *distinct file-content-digest sets* meets a threshold. Exact — no
sketching — via an inverted digest index:

1. ``digest_table`` drops content at the scan; rows become
   (repo, digest, _dp) — ~100 B/row regardless of file size.
2. One banded exchange on the digest prefix co-locates every copy of a
   digest. Per partition (digests never span partitions, so per-digest
   work is globally exact): distinct (repo, digest); digests present in
   more than ``max_repos_per_digest`` repos are dropped *entirely*
   (boilerplate — LICENSE/README in 10^6 repos would emit 10^12 pairs;
   drops are metered under ``repo_neardup_dropped_digests``, and sizes
   are computed from the same filtered set so Jaccard stays internally
   exact); remaining multi-repo digests emit (repo_a < repo_b) pair
   partials and every repo a distinct-digest-count partial.
3. Pair partials and size partials each sum through a small second
   exchange (both tables are candidate-bounded — the corpus itself never
   re-shuffles); sizes attach to pairs via the broadcast↔join
   ``attach_lookup`` on a 64-bit repo key.
4. Integer-exact filter: keep ``10000·inter ≥ threshold_bp·union``;
   report ``jacc_bp``/``cont_bp`` basis points (containment flags
   subset-style forks whose Jaccard is diluted by the larger parent).

Scale notes: the only corpus-sized shuffle is step 2's digest-metadata
exchange (the same shape as exact dedup). Worker memory is bounded by a
partition of digest metadata, never by the corpus or by any repo's file
list beyond the df cap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

_MULT = np.uint64(0x9E3779B97F4A7C15)


def _repo_key(name: str, memo: dict) -> int:
    """Deterministic 64-bit int key for a repo name (blake2b-8); memoized
    per partition — repos per partition are bounded, so this is O(distinct)."""
    k = memo.get(name)
    if k is None:
        import hashlib

        k = int.from_bytes(
            hashlib.blake2b(name.encode(), digest_size=8).digest(),
            "big",
            signed=True,
        )
        memo[name] = k
    return k


def _part_from_int64(vals: np.ndarray, num_parts: int) -> np.ndarray:
    u = vals.view(np.uint64)
    return (((u * _MULT) >> np.uint64(40)) % np.uint64(num_parts)).astype(
        np.int64
    )


def _sum_by_key(
    ds: Dataset,
    key_cols: list[str],
    part_key: str,
    num_parts: int,
    keep_cols: list[str],
) -> Dataset:
    """Sum ``cnt`` per key via the hash exchange (partials → exact)."""
    from quichash_ray.stages.exchange import hash_exchange

    def add_part(b: pa.Table) -> pa.Table:
        part = _part_from_int64(
            np.asarray(b[part_key], dtype=np.int64), num_parts
        )
        return b.append_column("part", pa.array(part))

    def agg(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        # empty partitions surface with whatever schema the input blocks
        # carried (Ray skips UDFs on zero-row blocks) — emit a typed empty
        if not len(df) or "cnt" not in df.columns:
            return pa.table(
                {
                    **{
                        c: pa.array(
                            [], pa.string() if c in ("ra", "rb")
                            else pa.int64()
                        )
                        for c in keep_cols
                    },
                    "cnt": pa.array([], pa.int64()),
                }
            )
        out = (
            df.groupby(key_cols, sort=False, dropna=False)
            .agg(cnt=("cnt", "sum"), **{
                c: (c, "first") for c in keep_cols if c not in key_cols
            })
            .reset_index()
        )
        out["cnt"] = out["cnt"].astype("int64")
        return pa.Table.from_pandas(
            out[keep_cols + ["cnt"]], preserve_index=False
        )

    return hash_exchange(
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None),
        "part",
        agg,
        num_parts,
    )


def latest_snapshot(
    ds: Dataset,
    key_cols: tuple[str, ...] = ("repo", "path"),
    version_col: str = "commit",
    broadcast_limit: int = 20_000_000,
) -> Dataset:
    """Compact an incremental corpus to its latest snapshot: keep the
    row(s) carrying the maximum ``version_col`` per ``key_cols`` — the
    Iceberg/Delta-style latest-wins primitive a crawl-and-recrawl or
    commit-history corpus needs before dedup (versions of a file are
    near-identical by construction and would otherwise flood every fuzzy
    stage with self-pairs).

    Two tiers (the verify_mixed / decontaminate discipline):

    - winners ≤ ``broadcast_limit``: per-batch partial max → small exact
      reduce → winners broadcast once as sorted key/version arrays; the
      corpus streams through a filter ``version == max(version(key))`` —
      content never enters a shuffle, exact string comparison (no hash
      identities).
    - above the limit: a key-partitioned ``groupby(key).map_groups``
      keeping each group's max-version rows — content rides one
      partitioned exchange, unavoidable when the winner set itself
      exceeds worker heaps (a winners inner join would shuffle the same
      content PLUS the winner table).

    Ties (several rows at the max version for a key) all survive,
    mirroring SQL ``version = max(version) OVER key`` semantics.
    """
    import ray

    sep = "\x00"  # cannot occur in repo/path strings
    cols = [*key_cols, version_col]

    def partial_max(b: pa.Table) -> pa.Table:
        df = b.select(cols).to_pandas()
        out = df.groupby(list(key_cols), sort=False, dropna=False)[
            version_col
        ].max()
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    def final_max(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(list(key_cols), sort=False, dropna=False)[version_col]
            .max()
            .reset_index()
        )

    # thin metadata reduce: (key_cols..., max version) — bounded by
    # distinct keys, never corpus rows; also decides the tier
    winners = (
        ds.select_columns(cols)
        .map_batches(partial_max, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby(list(key_cols))
        .map_groups(final_max, batch_format="pandas")
        .materialize()
    )

    if winners.count() <= broadcast_limit:
        keys_l: list[str] = []
        vers_l: list[str] = []
        for b in winners.iter_batches(batch_format="pyarrow", batch_size=None):
            if b.num_rows == 0:
                continue
            joined = b[key_cols[0]]
            for k in key_cols[1:]:
                joined = pa.compute.binary_join_element_wise(
                    joined, b[k], pa.scalar(sep)
                )
            keys_l.extend(joined.to_pylist())
            vers_l.extend(b[version_col].to_pylist())
        karr = np.asarray(keys_l, dtype=object)
        varr = np.asarray(vers_l, dtype=object)
        order = np.argsort(karr)
        ref = ray.put((karr[order], varr[order]))

        def keep_latest(b: pa.Table) -> pa.Table:
            from quichash_ray.stages.broadcast import cached_get

            km, vm = cached_get(ref)
            if b.num_rows == 0 or len(km) == 0:
                return b.slice(0, 0)
            joined = b[key_cols[0]]
            for k in key_cols[1:]:
                joined = pa.compute.binary_join_element_wise(
                    joined.combine_chunks()
                    if isinstance(joined, pa.ChunkedArray)
                    else joined,
                    b[k].combine_chunks()
                    if isinstance(b[k], pa.ChunkedArray)
                    else b[k],
                    pa.scalar(sep),
                )
            cur = np.asarray(joined.to_pylist(), dtype=object)
            pos = np.clip(np.searchsorted(km, cur), 0, len(km) - 1)
            hit = km[pos] == cur
            keep = hit & (
                np.asarray(b[version_col].to_pylist(), dtype=object)
                == vm[pos]
            )
            return b.filter(pa.array(keep))

        return ds.map_batches(
            keep_latest, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    # giant-key-set tier: partition full rows by key and keep each
    # group's max-version rows — one content exchange, exact
    def keep_max(g: pd.DataFrame) -> pd.DataFrame:
        return g[g[version_col] == g[version_col].max()]

    return ds.groupby(list(key_cols)).map_groups(
        keep_max, batch_format="pandas"
    )


def repo_neardup(
    ds: Dataset,
    threshold_bp: int = 5000,
    repo_col: str = "repo",
    content_col: str = "content",
    max_repos_per_digest: int = 256,
    algorithm: str = "sha256",
    num_parts: int | None = None,
) -> Dataset:
    """→ (repo_a, repo_b, inter, union_cnt, jacc_bp, cont_bp), one row per
    repo pair whose digest-set Jaccard ≥ threshold_bp/10000 (integer-exact).
    """
    from quichash_ray.pipelines.dedup import digest_table
    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.lookup import attach_lookup
    from quichash_ray.stages.partitioning import dataset_num_parts
    from quichash_ray.state.metrics import get_metrics_actor

    metrics = get_metrics_actor()

    digests = digest_table(
        ds, content_col=content_col, key_cols=(repo_col,),
        algorithm=algorithm,
    ).materialize()
    if num_parts is None:
        num_parts = dataset_num_parts(
            digests, bytes_per_row=100, target_bytes=32 << 20
        )
    P = num_parts

    def add_part(b: pa.Table) -> pa.Table:
        # null digest = null content; skip-and-count discipline
        valid = pa.compute.is_valid(b["digest"])
        n_null = b.num_rows - pa.compute.sum(valid).as_py()
        if n_null:
            metrics.add.remote("repo_neardup_null_content", int(n_null))
            b = b.filter(valid)
        part = _part_from_int64(np.asarray(b["_dp"], dtype=np.int64), P)
        return pa.table(
            {
                "repo": b[repo_col],
                "digest": b["digest"],
                "part": pa.array(part),
            }
        )

    empty_mixed = pa.table(
        {
            "kind": pa.array([], pa.int8()),
            "ra": pa.array([], pa.string()),
            "rb": pa.array([], pa.string()),
            "ka": pa.array([], pa.int64()),
            "kb": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64()),
        }
    )

    def per_partition(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty_mixed
        df = g.to_pandas()[["repo", "digest"]].drop_duplicates()
        dfc = df.groupby("digest", sort=False)["repo"].transform("size")
        over = dfc > max_repos_per_digest
        if over.any():
            metrics.add.remote(
                "repo_neardup_dropped_digests",
                int(df.loc[over, "digest"].nunique()),
            )
            df = df[~over]
            dfc = dfc[~over]
        if not len(df):
            return empty_mixed
        memo: dict = {}
        ka = df["repo"].map(lambda r: _repo_key(r, memo)).to_numpy(np.int64)
        # size partials (post-df-filter, so Jaccard denominators match)
        sz = (
            pd.DataFrame({"repo": df["repo"].to_numpy(), "ka": ka})
            .groupby(["repo", "ka"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        parts = [
            pa.table(
                {
                    "kind": pa.array([1] * len(sz), pa.int8()),
                    "ra": pa.array(sz["repo"], pa.string()),
                    "rb": pa.nulls(len(sz), pa.string()),
                    "ka": pa.array(sz["ka"].to_numpy(np.int64), pa.int64()),
                    "kb": pa.array(np.zeros(len(sz), np.int64), pa.int64()),
                    "cnt": pa.array(sz["cnt"].to_numpy(np.int64), pa.int64()),
                }
            )
        ]
        # pair partials from multi-repo digests only. The loop runs over
        # cross-repo duplicate digests (forked content), not the corpus;
        # each group is ≤ max_repos_per_digest.
        multi = dfc.to_numpy() >= 2
        if multi.any():
            sub = df[multi].sort_values(["digest", "repo"], kind="stable")
            sub = sub.reset_index(drop=True)
            ksub = sub["repo"].map(
                lambda r: _repo_key(r, memo)
            ).to_numpy(np.int64)
            repos = sub["repo"].to_numpy()
            digs = sub["digest"].to_numpy()
            bounds = np.flatnonzero(
                np.r_[True, digs[1:] != digs[:-1], True]
            )
            pa_l, pb_l, ka_l, kb_l = [], [], [], []
            for s, e in zip(bounds[:-1], bounds[1:]):
                gsz = e - s
                if gsz < 2:
                    continue
                i, j = np.triu_indices(gsz, 1)
                pa_l.append(repos[s:e][i])
                pb_l.append(repos[s:e][j])
                ka_l.append(ksub[s:e][i])
                kb_l.append(ksub[s:e][j])
            if pa_l:
                pra = np.concatenate(pa_l)
                prb = np.concatenate(pb_l)
                kaa = np.concatenate(ka_l)
                kbb = np.concatenate(kb_l)
                pair_df = (
                    pd.DataFrame(
                        {"ra": pra, "rb": prb, "ka": kaa, "kb": kbb}
                    )
                    .groupby(["ra", "rb", "ka", "kb"], sort=False)
                    .size()
                    .reset_index(name="cnt")
                )
                parts.append(
                    pa.table(
                        {
                            "kind": pa.array(
                                [0] * len(pair_df), pa.int8()
                            ),
                            "ra": pa.array(pair_df["ra"], pa.string()),
                            "rb": pa.array(pair_df["rb"], pa.string()),
                            "ka": pa.array(
                                pair_df["ka"].to_numpy(np.int64), pa.int64()
                            ),
                            "kb": pa.array(
                                pair_df["kb"].to_numpy(np.int64), pa.int64()
                            ),
                            "cnt": pa.array(
                                pair_df["cnt"].to_numpy(np.int64), pa.int64()
                            ),
                        }
                    )
                )
        return pa.concat_tables(parts)

    mixed = hash_exchange(
        digests.map_batches(
            add_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "part",
        per_partition,
        P,
    ).materialize()

    import pyarrow.compute as pc

    def _filter_kind(k: int):
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "kind" not in b.column_names:
                return empty_mixed.drop_columns(["kind"])
            return b.filter(pc.equal(b["kind"], k)).drop_columns(["kind"])

        return f

    # both tables are candidate-bounded: P2 sized to them, not the corpus
    pairs_raw = mixed.map_batches(
        _filter_kind(0), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()
    sizes_raw = mixed.map_batches(
        _filter_kind(1), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()
    P2 = dataset_num_parts(pairs_raw, bytes_per_row=120, target_bytes=32 << 20)
    P3 = dataset_num_parts(sizes_raw, bytes_per_row=80, target_bytes=32 << 20)

    def add_pair_key(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("pk", pa.array([], pa.int64()))
        ka = np.asarray(b["ka"], dtype=np.int64).view(np.uint64)
        kb = np.asarray(b["kb"], dtype=np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            pk = (ka * np.uint64(3) + kb).view(np.int64)
        return b.append_column("pk", pa.array(pk, pa.int64()))

    # pk partitions only; the group key is the exact (ka, kb) pair, so a
    # pk collision between distinct pairs cannot merge their counts
    pairs = _sum_by_key(
        pairs_raw.map_batches(
            add_pair_key, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        key_cols=["ka", "kb"],
        part_key="pk",
        num_parts=P2,
        keep_cols=["ra", "rb", "ka", "kb"],
    )
    sizes = _sum_by_key(
        sizes_raw,
        key_cols=["ka"],
        part_key="ka",
        num_parts=P3,
        keep_cols=["ka"],
    )

    pairs = attach_lookup(
        pairs, sizes, key_col="ka", value_col="cnt", out_col="sz_a",
        key_col_in_mapping="ka",
    )
    pairs = attach_lookup(
        pairs, sizes, key_col="kb", value_col="cnt", out_col="sz_b",
        key_col_in_mapping="ka",
    )

    empty_final = pa.table(
        {
            "repo_a": pa.array([], pa.string()),
            "repo_b": pa.array([], pa.string()),
            "inter": pa.array([], pa.int64()),
            "union_cnt": pa.array([], pa.int64()),
            "jacc_bp": pa.array([], pa.int64()),
            "cont_bp": pa.array([], pa.int64()),
        }
    )

    def finalize(b: pa.Table) -> pa.Table:
        empty = empty_final
        if b.num_rows == 0 or "sz_b" not in b.column_names:
            return empty
        inter = np.asarray(b["cnt"], dtype=np.int64)
        sa = np.asarray(b["sz_a"], dtype=np.int64)
        sb = np.asarray(b["sz_b"], dtype=np.int64)
        un = sa + sb - inter
        keep = 10000 * inter >= threshold_bp * un
        if not keep.any():
            return empty
        inter, sa, sb, un = inter[keep], sa[keep], sb[keep], un[keep]
        kt = pa.array(keep)
        return pa.table(
            {
                "repo_a": b["ra"].combine_chunks().filter(kt)
                if isinstance(b["ra"], pa.ChunkedArray)
                else b["ra"].filter(kt),
                "repo_b": b["rb"].combine_chunks().filter(kt)
                if isinstance(b["rb"], pa.ChunkedArray)
                else b["rb"].filter(kt),
                "inter": pa.array(inter, pa.int64()),
                "union_cnt": pa.array(un, pa.int64()),
                "jacc_bp": pa.array(10000 * inter // un, pa.int64()),
                "cont_bp": pa.array(
                    10000 * inter // np.minimum(sa, sb), pa.int64()
                ),
            }
        )

    import ray.data

    # a typed empty block keeps the output schema stable even when no
    # pair survives (zero-block datasets otherwise lose their schema)
    return pairs.map_batches(
        finalize, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(ray.data.from_arrow(empty_final))
