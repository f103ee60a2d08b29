"""N-gram (shingle) Jaccard similarity — distributed, integer-exact.

Pipeline shape (all Ray Data, no driver materialization):

    docs → flat_map: distinct (id, gram) per doc        [stateless map]
         → groupby(gram): emit candidate pairs          [shuffle #1]
         → groupby(id_a, id_b): shared-gram counts      [shuffle #2]
         → join per-doc gram totals (twice)             [shuffle #3]
         → integer Jaccard filter: q·shared ≥ p·(nA+nB−shared)

The Jaccard threshold is a rational p/q so the filter is integer-exact and
matches the DuckDB oracle bit-for-bit (no float comparisons).

Grams are 64-bit polynomial hashes of token crc32s (vectorized numpy) — at
~10^5 grams/test corpus the collision probability is ~2^-30; the hash is
deterministic across processes (no PYTHONHASHSEED hazard).

Skew: a gram shared by more than ``gram_cap`` docs (boilerplate) is dropped
before pair emission — the quadratic-blowup guard the reference has no answer
for (its dedup HashMap is driver-resident, SURVEY §4 skew row). Dropped grams
reduce ``shared`` symmetrically; at the default cap this only affects
pathological boilerplate.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

_P = np.uint64(1099511628211)  # FNV-ish odd multiplier; wraps mod 2^64

# worker-level token→crc32 memo: real-code token frequency is Zipfian, so
# cache hits dominate; bounded to keep worker heap flat on adversarial input
_CRC_CACHE: dict[str, int] = {}
_CRC_CACHE_CAP = 1_000_000


def _token_crc(tok: str) -> int:
    v = _CRC_CACHE.get(tok)
    if v is None:
        v = zlib.crc32(tok.encode("utf-8"))
        if len(_CRC_CACHE) >= _CRC_CACHE_CAP:
            _CRC_CACHE.clear()
        _CRC_CACHE[tok] = v
    return v


def gram_hashes(tokens: list[str], k: int) -> np.ndarray:
    """Distinct 64-bit hashes of the k-token shingles of ``tokens``."""
    n = len(tokens)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    cache_get = _CRC_CACHE.get
    t = np.fromiter(
        (
            v if (v := cache_get(tok)) is not None else _token_crc(tok)
            for tok in tokens
        ),
        dtype=np.uint64,
        count=n,
    )
    with np.errstate(over="ignore"):
        h = t[: n - k + 1].copy()
        for j in range(1, k):
            h = h * _P + t[j : n - k + 1 + j]
    return np.unique(h)


def shingle_table(
    ds: Dataset,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """→ (id, gram) — one row per distinct shingle per document.

    Tokenizes with the RE2-equivalent ``[^ \\t\\n\\f\\r]+`` (NOT
    ``str.split()``, which also splits on \\v and Unicode whitespace) so
    the engine matches the DuckDB ``regexp_extract_all(text, '\\S+')``
    oracles on non-ASCII whitespace (textstats.py:211 hazard note).
    """
    tok_re = re.compile(r"[^ \t\n\f\r]+")

    def kernel(b: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        grams_out: list[np.ndarray] = []
        for rid, text in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            if text is None:
                continue
            g = gram_hashes(tok_re.findall(text), k)
            ids_out.extend([rid] * len(g))
            grams_out.append(g)
        grams = (
            np.concatenate(grams_out) if grams_out else np.empty(0, np.uint64)
        )
        return pa.table(
            {
                id_col: pa.array(ids_out, pa.int64()),
                "gram": pa.array(grams.view(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def gram_totals(shingles: Dataset, id_col: str = "doc_id") -> Dataset:
    """→ (id, n_grams) — distinct-shingle count per document."""
    return shingles.groupby(id_col).aggregate(Count(alias_name="n_grams"))


def candidate_pair_counts(
    shingles: Dataset,
    id_col: str = "doc_id",
    gram_cap: int | None = 256,
    num_bands: int = 32,
) -> Dataset:
    """→ (id_a, id_b, shared): co-occurring gram counts, id_a < id_b.

    Manual hash-partition + local vectorized join: every gram lands in
    exactly one of ``num_bands`` partitions (``gram % num_bands``), so a
    per-band ``map_groups`` sees ALL rows of each of its grams and can do a
    local numpy self-join. Per-group Python overhead is paid ``num_bands``
    times, not once per gram (millions). A pair sharing grams across several
    bands is summed by the final groupby.

    ``gram_cap`` drops grams whose document frequency exceeds the cap (hot
    boilerplate → quadratic pair blowup); df is exact within a band because a
    gram never spans bands. Every dropped gram is counted on the metrics
    actor (``ngram_dropped_grams`` / ``ngram_dropped_gram_rows``) — no
    silent caps; pass ``gram_cap=None`` to disable the cap entirely (the
    oracle-checked configuration). ``num_bands`` is the shuffle-parallelism
    knob — scale it with cluster size, and raise it further to salt band
    skew.
    """
    from quichash_ray.state.metrics import get_metrics_actor

    metrics = get_metrics_actor()
    cap = gram_cap if gram_cap is not None else np.iinfo(np.int64).max

    def add_band(b: pa.Table) -> pa.Table:
        band = np.asarray(b["gram"]).astype(np.uint64) % np.uint64(num_bands)
        return b.append_column("band", pa.array(band.astype(np.int64)))

    banded = shingles.map_batches(
        add_band, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def local_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # grams sorted; restrict to grams with 2..gram_cap docs, then emit
        # all doc pairs per gram via vectorized segment arithmetic
        grams = g["gram"].to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, grams))
        grams, ids = grams[order], ids[order]
        uniq, start, cnt = np.unique(
            grams, return_index=True, return_counts=True
        )
        over = cnt > cap
        if over.any():
            metrics.add.remote("ngram_dropped_grams", int(over.sum()))
            metrics.add.remote(
                "ngram_dropped_gram_rows", int(cnt[over].sum())
            )
        keep = (cnt >= 2) & (cnt <= cap)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, c in zip(start[keep], cnt[keep]):
            seg = ids[s : s + c]
            ia, ib = np.triu_indices(c, k=1)
            out_a.append(seg[ia])
            out_b.append(seg[ib])
        if not out_a:
            return pd.DataFrame(
                {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64),
                 "partial": np.empty(0, np.int64)}
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        df = pd.DataFrame({"id_a": a, "id_b": b})
        counts = df.value_counts(["id_a", "id_b"]).reset_index(name="partial")
        return counts.astype(
            {"id_a": np.int64, "id_b": np.int64, "partial": np.int64}
        )

    partials = banded.groupby("band").map_groups(
        local_pairs, batch_format="pandas"
    )
    return partials.groupby(["id_a", "id_b"]).aggregate(
        Sum("partial", alias_name="shared")
    )


def _pairs_with_totals(
    ds: Dataset,
    k: int,
    id_col: str,
    text_col: str,
    gram_cap: int | None,
    num_partitions: int,
) -> Dataset:
    """shared machinery of the pair detectors: shingles → candidate pair
    counts → per-doc totals attached as n_a / n_b (broadcast↔join via
    attach_lookup, never a driver dict)."""
    from quichash_ray.stages.lookup import attach_lookup

    shingles = shingle_table(ds, k, id_col, text_col)
    totals = gram_totals(shingles, id_col)
    counts = candidate_pair_counts(shingles, id_col, gram_cap)

    j1 = attach_lookup(
        counts,
        totals,
        key_col="id_a",
        value_col="n_grams",
        out_col="n_a",
        key_col_in_mapping=id_col,
        num_partitions=num_partitions,
    )
    return attach_lookup(
        j1,
        totals,
        key_col="id_b",
        value_col="n_grams",
        out_col="n_b",
        key_col_in_mapping=id_col,
        num_partitions=num_partitions,
    )


def _filter_pairs(j2: Dataset, rhs_fn) -> Dataset:
    """shared tail of the pair detectors: keep pairs where q·shared ≥
    rhs_fn(shared, n_a, n_b), emitting the canonical int64 columns."""

    def flt(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        shared = pc.cast(b["shared"], pa.int64())
        na = pc.cast(b["n_a"], pa.int64())
        nb = pc.cast(b["n_b"], pa.int64())
        out = pa.table(
            {
                "id_a": b["id_a"],
                "id_b": b["id_b"],
                "shared": shared,
                "n_a": na,
                "n_b": nb,
            }
        )
        return out.filter(rhs_fn(shared, na, nb))

    return j2.map_batches(flt, batch_format="pyarrow", batch_size=None)


def containment_pairs(
    ds: Dataset,
    k: int = 5,
    threshold_num: int = 4,
    threshold_den: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_cap: int | None = 256,
    num_partitions: int = 16,
) -> Dataset:
    """→ (id_a, id_b, shared, n_a, n_b) for pairs where the SMALLER doc's
    gram set is ≥ p/q contained in the other: shared / min(n_a, n_b) ≥
    p/q ⇔ q·shared ≥ p·min(n_a, n_b), evaluated in int64 on both engine
    and oracle. Catches subset duplication (a file embedded in a larger
    one) that symmetric Jaccard dilutes below its threshold."""
    import pyarrow.compute as pc

    p, q = threshold_num, threshold_den
    j2 = _pairs_with_totals(
        ds, k, id_col, text_col, gram_cap, num_partitions
    )

    def keep(shared, na, nb):
        return pc.greater_equal(
            pc.multiply(pa.scalar(q, pa.int64()), shared),
            pc.multiply(
                pa.scalar(p, pa.int64()), pc.min_element_wise(na, nb)
            ),
        )

    return _filter_pairs(j2, keep)


def jaccard_pairs(
    ds: Dataset,
    k: int = 5,
    threshold_num: int = 1,
    threshold_den: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_cap: int | None = 256,
    num_partitions: int = 16,
) -> Dataset:
    """→ (id_a, id_b, shared, n_a, n_b) for pairs with Jaccard ≥ p/q.

    J = shared / (n_a + n_b - shared) ≥ p/q  ⇔  q·shared ≥ p·(n_a+n_b-shared)
    — evaluated in int64 on both engine and oracle.

    Per-doc totals attach via :func:`attach_lookup` — two sorted numpy
    arrays broadcast once below its limit, a hash-shuffle ``Dataset.join``
    above it (the 10^8+-doc path); never a driver-side per-row dict.
    """
    import pyarrow.compute as pc

    j2 = _pairs_with_totals(
        ds, k, id_col, text_col, gram_cap, num_partitions
    )
    p, q = threshold_num, threshold_den

    def keep(shared, na, nb):
        return pc.greater_equal(
            pc.multiply(pa.scalar(q, pa.int64()), shared),
            pc.multiply(
                pa.scalar(p, pa.int64()),
                pc.subtract(pc.add(na, nb), shared),
            ),
        )

    return _filter_pairs(j2, keep)


def similar_docs_topk(
    ds: Dataset,
    k_top: int = 3,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_cap: int | None = 256,
    num_partitions: int = 16,
) -> Dataset:
    """Per-document similar-document search: for every doc, its ``k_top``
    most similar docs by k-gram Jaccard among candidates sharing ≥ 1
    gram — the "related documents" / dedup-triage view of the pair
    detectors. → (doc_id, other_id, shared, n_self, n_other, rnk).

    Ordering is (Jaccard DESC, other_id ASC) where Jaccard =
    shared / (n_self + n_other − shared); both engine and oracle compute
    it as ONE double division of the same int64s, so the ranking is
    bit-identical (the tfidf_top_terms discipline).

    Shape: the shared pair machinery (shingles → candidate counts →
    totals attach), then each canonical pair is emitted in BOTH
    directions (a stateless map — pair output is quadratic-bounded by
    gram_cap, not corpus size) and one hash exchange on doc_id ranks
    per-doc lists locally. No driver materialization.
    """
    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.partitioning import key_part_column

    j2 = _pairs_with_totals(
        ds, k, id_col, text_col, gram_cap, num_partitions
    )

    def both_dirs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ida = pc.cast(b["id_a"], pa.int64())
        idb = pc.cast(b["id_b"], pa.int64())
        shared = pc.cast(b["shared"], pa.int64())
        na = pc.cast(b["n_a"], pa.int64())
        nb = pc.cast(b["n_b"], pa.int64())
        fwd = pa.table(
            {"src": ida, "other": idb, "shared": shared,
             "n_self": na, "n_other": nb}
        )
        rev = pa.table(
            {"src": idb, "other": ida, "shared": shared,
             "n_self": nb, "n_other": na}
        )
        t = pa.concat_tables([fwd, rev])
        return t.append_column(
            "part", key_part_column(t["src"], num_partitions)
        )

    sym = j2.map_batches(
        both_dirs, batch_format="pyarrow", batch_size=None
    )

    def topk(g: pa.Table) -> pa.Table:
        cols = {
            "doc_id": pa.int64(), "other_id": pa.int64(),
            "shared": pa.int64(), "n_self": pa.int64(),
            "n_other": pa.int64(), "rnk": pa.int64(),
        }
        if g.num_rows == 0 or "src" not in g.column_names:
            return pa.table(
                {c: pa.array([], t) for c, t in cols.items()}
            )
        df = g.to_pandas()
        df["sim"] = df["shared"] / (
            df["n_self"] + df["n_other"] - df["shared"]
        )
        df = df.sort_values(
            ["src", "sim", "other"], ascending=[True, False, True]
        )
        df["rnk"] = df.groupby("src", sort=False).cumcount() + 1
        kept = df[df["rnk"] <= k_top]
        return pa.Table.from_pandas(
            kept.rename(columns={"src": "doc_id", "other": "other_id"})[
                ["doc_id", "other_id", "shared", "n_self", "n_other", "rnk"]
            ].astype("int64"),
            preserve_index=False,
        )

    return hash_exchange(sym, "part", topk, num_partitions)


def ngram_novelty(
    ds: Dataset,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Per-document n-gram novelty — the fraction of a doc's distinct
    k-grams that no LOWER-id document contains (id order standing in
    for crawl/arrival order): the curriculum / marginal-information
    signal ("how much of this doc is new to the corpus?").
    → (doc_id, n_grams, n_novel, novelty).

    Shape: distinct shingles → groupby(gram) Min(id) assigns each gram
    one owner → owner counts + per-doc totals, joined by
    ``attach_lookup`` (broadcast ↔ co-partitioned join tiers). Every
    shuffle carries (gram-hash, id) or (id, count) rows — content never
    moves. ``novelty`` is one double division of the same int64s on
    engine and oracle.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Min as AggMin

    from quichash_ray.stages.lookup import attach_lookup

    shingles = shingle_table(ds, k, id_col, text_col)
    totals = gram_totals(shingles, id_col)
    owners = shingles.groupby("gram").aggregate(
        AggMin(id_col, alias_name="owner")
    )
    novel = owners.groupby("owner").aggregate(Count(alias_name="n_novel"))
    out = attach_lookup(
        totals,
        novel,
        key_col=id_col,
        value_col="n_novel",
        out_col="n_novel",
        key_col_in_mapping="owner",
        default=0,
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_grams" not in b.column_names:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "n_novel": pa.array([], pa.int64()),
                    "novelty": pa.array([], pa.float64()),
                }
            )
        ng = pc.cast(b["n_grams"], pa.int64())
        nv = pc.cast(b["n_novel"], pa.int64())
        return pa.table(
            {
                id_col: b[id_col],
                "n_grams": ng,
                "n_novel": nv,
                "novelty": pc.divide(
                    pc.cast(nv, pa.float64()), pc.cast(ng, pa.float64())
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", batch_size=None)
