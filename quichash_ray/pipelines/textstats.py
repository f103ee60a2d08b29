"""Text-analysis pipelines over a (id, text) table — token counts, quality
counts, language ID, fingerprints. Stateless vectorized map_batches stages.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
from ray.data import Dataset

from quichash_ray.functions.text import (
    bpe_token_count_array,
    char_class_counts,
    lang_scores,
    predict_lang,
    token_count_array,
)


def token_counts(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """→ (id, n_ws_tokens, n_bpe_tokens): whitespace tokens and BPE-ish
    pre-tokens (letter runs / digits / punctuation runs) — the two token
    budgets a training-data pipeline tracks, both vectorized RE2."""

    def kernel(b: pa.Table) -> pa.Table:
        text = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray
        ) else b[text_col]
        return pa.table(
            {
                id_col: b[id_col],
                "n_ws_tokens": token_count_array(text),
                "n_bpe_tokens": bpe_token_count_array(text),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def text_quality(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """→ (id, n_chars, n_tokens, alpha_chars, digit_chars) — all int64 so
    oracle comparison is exact (no float hashing hazards)."""

    def kernel(b: pa.Table) -> pa.Table:
        text = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray
        ) else b[text_col]
        cc = char_class_counts(text)
        return pa.table(
            {
                id_col: b[id_col],
                "n_chars": cc["n_chars"],
                "n_tokens": token_count_array(text),
                "alpha_chars": cc["alpha_chars"],
                "digit_chars": cc["digit_chars"],
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def language_id(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """→ (id, score_en, score_de, score_fr, pred_lang)."""

    def kernel(b: pa.Table) -> pa.Table:
        text = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray
        ) else b[text_col]
        scores = lang_scores(text)
        return pa.table(
            {
                id_col: b[id_col],
                "score_en": scores["en"],
                "score_de": scores["de"],
                "score_fr": scores["fr"],
                "pred_lang": predict_lang(scores),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def fingerprints(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """→ (id, fingerprint) — md5 of the whitespace-normalized, lowercased
    text: a deterministic near-canonical document fingerprint."""

    def kernel(b: pa.Table) -> pa.Table:
        # one vectorized RE2 normalize pass + zero-copy views; the per-row
        # body is only the md5 C call (digest-stage discipline)
        from quichash_ray.functions.text import normalize_fp_array
        from quichash_ray.stages.digest import content_byte_views

        views, _ = content_byte_views(
            pa.table({"t": normalize_fp_array(b[text_col])}), "t"
        )
        fps = [
            None if v is None else hashlib.md5(v).hexdigest() for v in views
        ]
        return pa.table(
            {id_col: b[id_col], "fingerprint": pa.array(fps, pa.string())}
        )

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


_STOPWORDS = (
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "be", "this", "are", "or",
)


def vocab_topk(
    ds: Dataset, k: int = 500, text_col: str = "text"
) -> Dataset:
    """Corpus vocabulary: top-k most frequent whitespace tokens with a
    deterministic (count DESC, token ASC) tie-break — the vocab-building /
    frequency-table primitive (BPE training input, stopword discovery).

    Shape: per-batch partial counts (the combiner pattern — the shuffle
    carries (token, partial_count) rows, vocab-sized, never token
    instances) → groupby-sum → global sort + limit over the vocab-sized
    aggregate. Tokenizer is RE2 ``[ \\t\\n\\f\\r]+`` splitting, identical
    to the DuckDB oracle's ``string_split_regex``.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        text = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray
        ) else b[text_col]
        lists = pc.split_pattern_regex(text, pattern=r"[ \t\n\f\r]+")
        lists = lists.combine_chunks() if isinstance(
            lists, pa.ChunkedArray
        ) else lists
        vals = lists.flatten()
        vals = vals.filter(pc.not_equal(vals, ""))
        if len(vals) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        vc = pd.Series(vals.to_pandas().values).value_counts()
        return pa.table(
            {
                "token": pa.array(vc.index.to_numpy(), pa.string()),
                "cnt": pa.array(vc.to_numpy().astype(np.int64)),
            }
        )

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).groupby("token").sum("cnt")

    def rename(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(cnt)" not in b.column_names:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        return pa.table(
            {"token": b["token"], "cnt": pc.cast(b["sum(cnt)"], pa.int64())}
        )

    return (
        agg.map_batches(rename, batch_format="pyarrow", batch_size=None)
        .sort(["cnt", "token"], descending=[True, False])
        .limit(k)
    )


def gopher_quality(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_stopword_ratio_bp: int = 0,
    max_dup_3gram_bp: int = 10_000,
) -> Dataset:
    """Gopher-rule-style quality signals per document, integer-exact:

    - ``n_tokens``: whitespace tokens;
    - ``stopword_hits``: occurrences of a fixed 20-word English stopword
      list (word-boundary matches — a fluency signal);
    - ``dup_3gram_bp``: basis points of word-3-gram occurrences that are
      repeats of an earlier 3-gram in the same document (the repetition
      signal; 0 = no repetition);
    - ``passes``: 1 iff token count in [min, max], stopword ratio ≥
      threshold, repetition ≤ threshold.

    All thresholds are integer basis points so the engine and the DuckDB
    oracle agree bit-for-bit.
    """
    import re

    import numpy as np
    import pyarrow.compute as pc

    sw_pattern = r"\b(" + "|".join(_STOPWORDS) + r")\b"
    # Tokenizer identical to the RE2 '\S+' the oracle and
    # token_count_array use: RE2 \s = [ \t\n\f\r] (no \v). str.split()
    # would also split on \v and Unicode whitespace and diverge.
    tok_re = re.compile(r"[^ \t\n\f\r]+")

    def kernel(b: pa.Table) -> pa.Table:
        text = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray
        ) else b[text_col]
        n_tok = token_count_array(text)
        sw = pc.cast(pc.count_substring_regex(text, sw_pattern), pa.int64())
        # repetition: per-doc duplicate word-3-gram share — distinct grams
        # counted EXACTLY (tuple set; a 32-bit token-hash scheme would
        # collide on ~1e5-distinct-token documents and drift vs the
        # oracle's count(DISTINCT))
        dup_bp = []
        for t in text.to_pylist():
            toks = tok_re.findall(t or "")
            total = max(0, len(toks) - 2)
            if total <= 0:
                dup_bp.append(0)
                continue
            distinct = len(set(zip(toks, toks[1:], toks[2:])))
            dup_bp.append((10000 * (total - distinct)) // total)
        n_tok_np = np.asarray(n_tok)
        sw_np = np.asarray(sw)
        dup_np = np.asarray(dup_bp, dtype=np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            sw_bp = np.where(
                n_tok_np > 0, (10000 * sw_np) // np.maximum(n_tok_np, 1), 0
            )
        passes = (
            (n_tok_np >= min_tokens)
            & (n_tok_np <= max_tokens)
            & (sw_bp >= min_stopword_ratio_bp)
            & (dup_np <= max_dup_3gram_bp)
        )
        return pa.table(
            {
                id_col: b[id_col],
                "n_tokens": n_tok,
                "stopword_hits": sw,
                "dup_3gram_bp": pa.array(dup_np, pa.int64()),
                "passes": pa.array(passes.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


def bpe_pair_counts(
    ds: Dataset, k: int = 200, text_col: str = "text"
) -> Dataset:
    """Adjacent-token-pair frequency table, top-k — the BPE merge-step
    primitive (Sennrich et al. 2016): each training iteration merges the
    most frequent adjacent pair; this operator is that counting step,
    distributed.

    Shape: the same combiner pattern as :func:`vocab_topk` — per-batch
    numpy pair construction over the flattened token lists (list-boundary
    pairs masked out, empty boundary tokens excluded) → per-batch partial
    counts → groupby-sum over (pair, partial) rows → deterministic
    (count DESC, pair ASC) top-k. The shuffle carries pair-vocabulary
    rows, never token instances.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    empty = pa.table(
        {"pair": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
    )

    def partial(b: pa.Table) -> pa.Table:
        text = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray
        ) else b[text_col]
        lists = pc.split_pattern_regex(text, pattern=r"[ \t\n\f\r]+")
        lists = lists.combine_chunks() if isinstance(
            lists, pa.ChunkedArray
        ) else lists
        vals = lists.flatten()  # values of VALID lists only (nulls skipped)
        n = len(vals)
        if n < 2:
            return empty
        # pair (i, i+1) is valid when it doesn't cross a list boundary and
        # neither side is the empty boundary token (the split regex
        # collapses runs, so '' can only appear at list edges — dropping
        # those pairs is exactly the oracle's list_filter(t <> '')).
        # Boundaries come from value lengths (null→0), NOT lists.offsets,
        # which misaligns with flatten() under null lists / array offsets.
        valid = np.ones(n - 1, dtype=bool)
        ll = np.asarray(pc.list_value_length(lists).fill_null(0), dtype=np.int64)
        cum = np.cumsum(ll)
        edges = cum[(cum > 0) & (cum < n)] - 1
        valid[edges] = False
        nonempty = np.asarray(pc.not_equal(vals, "").fill_null(False))
        valid &= nonempty[:-1] & nonempty[1:]
        if not valid.any():
            return empty
        pairs = pc.binary_join_element_wise(
            vals.slice(0, n - 1), vals.slice(1), pa.scalar(" ")
        ).filter(pa.array(valid))
        vc = pd.Series(pairs.to_pandas().values).value_counts()
        return pa.table(
            {
                "pair": pa.array(vc.index.to_numpy(), pa.string()),
                "cnt": pa.array(vc.to_numpy().astype(np.int64)),
            }
        )

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).groupby("pair").sum("cnt")

    def rename(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "sum(cnt)" not in b.column_names:
            return empty
        return pa.table(
            {"pair": b["pair"], "cnt": pc.cast(b["sum(cnt)"], pa.int64())}
        )

    return (
        agg.map_batches(rename, batch_format="pyarrow", batch_size=None)
        .sort(["cnt", "pair"], descending=[True, False])
        .limit(k)
    )


def doc_length_quantiles(
    ds: Dataset,
    quantiles: tuple[float, ...] = (0.10, 0.25, 0.50, 0.75, 0.90, 0.99),
    text_col: str = "text",
) -> pa.Table:
    """Exact discrete token-length quantiles of the corpus — the
    length-filter calibration step of a training-data pipeline (pick
    truncation/minimum thresholds from the real distribution, not guesses).

    Shape: per-batch value counts of the per-doc token count (a bounded
    table — one row per DISTINCT length, ≤ max doc length regardless of
    corpus size) → groupby-sum → the bounded aggregate comes to the driver
    where the discrete quantile rule is applied over the cumulative
    counts. Matches DuckDB ``quantile_disc`` exactly: the smallest length
    whose cumulative count ≥ ceil(q·n) (same double arithmetic both
    sides). Returns a one-row pa.Table (p10..p99, n_docs).
    """
    import math

    import numpy as np
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        text = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray
        ) else b[text_col]
        n_tok = pc.count_substring_regex(text, pattern=r"[^ \t\n\f\r]+")
        n_tok = pc.cast(n_tok, pa.int64()).drop_null()
        if len(n_tok) == 0:
            return pa.table(
                {"n": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())}
            )
        vals, counts = np.unique(np.asarray(n_tok), return_counts=True)
        return pa.table(
            {"n": pa.array(vals, pa.int64()),
             "cnt": pa.array(counts.astype(np.int64))}
        )

    agg = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).groupby("n").sum("cnt")

    # bounded by the number of distinct document lengths — safe to collect
    rows = agg.take_all()
    if not rows:
        cols = {f"p{int(q * 100)}": pa.array([None], pa.int64())
                for q in quantiles}
        cols["n_docs"] = pa.array([0], pa.int64())
        return pa.table(cols)
    ns = np.array([r["n"] for r in rows], dtype=np.int64)
    cs = np.array([r["sum(cnt)"] for r in rows], dtype=np.int64)
    order = np.argsort(ns)
    ns, cs = ns[order], cs[order]
    cum = np.cumsum(cs)
    total = int(cum[-1])
    cols = {}
    for q in quantiles:
        rank = max(1, math.ceil(q * total))
        idx = int(np.searchsorted(cum, rank, side="left"))
        cols[f"p{int(q * 100)}"] = pa.array([int(ns[idx])], pa.int64())
    cols["n_docs"] = pa.array([total], pa.int64())
    return pa.table(cols)


# worker-level token -> md5-prefix int64 memo (Zipfian vocab: hits dominate;
# bounded so adversarial vocab can't grow worker heap)
_TKEY_CACHE: dict[str, int] = {}
_TKEY_CACHE_CAP = 1_000_000


def _token_key(tok: str) -> int:
    v = _TKEY_CACHE.get(tok)
    if v is None:
        v = int.from_bytes(
            hashlib.md5(tok.encode("utf-8")).digest()[:8], "big", signed=True
        )
        if len(_TKEY_CACHE) >= _TKEY_CACHE_CAP:
            _TKEY_CACHE.clear()
        _TKEY_CACHE[tok] = v
    return v


def tfidf_top_terms(
    ds: Dataset,
    k_top: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_broadcast_limit: int = 50_000_000,
) -> Dataset:
    """→ (doc_id, token, tf, df, rnk): each document's top-``k_top`` terms
    by tf·idf with the rational idf 1/df — ordered by (tf/df DESC, tf
    DESC, token ASC), rnk ∈ 1..k_top. The classic IR relevance/keyword
    primitive over a corpus.

    Shape: pass 1 streams the corpus into per-batch DISTINCT-token
    partial counts → one vocab-sized groupby-sum → only tokens with
    df ≥ 2 broadcast (as sorted md5-prefix int64 keys + counts; a token
    MISSING from the broadcast has df = 1 by construction, so the
    broadcast is bounded by the repeated vocabulary — the linededup
    common-set discipline — not the full vocab with its long unique
    tail). Pass 2 re-streams docs, counts tf, attaches df by
    searchsorted, and takes the per-doc top-k inside the batch (docs
    never span blocks) — zero shuffles beyond the vocab aggregate.

    The tf/df score is one IEEE-754 double division on both engine and
    oracle, so ordering (and therefore the emitted integer rows) is
    bit-identical; ties break by (tf DESC, token ASC).
    ``df_broadcast_limit`` guards the broadcast tier: above it, raise —
    the caller should pre-prune boilerplate (a df table that large means
    the corpus needs line/boilerplate dedup first).
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from quichash_ray.stages.broadcast import cached_get

    def _tok_frame(b: pa.Table) -> "pd.DataFrame | None":
        text = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray
        ) else b[text_col]
        lists = pc.split_pattern_regex(text, pattern=r"[ \t\n\f\r]+")
        lists = lists.combine_chunks() if isinstance(
            lists, pa.ChunkedArray
        ) else lists
        vals = lists.flatten()
        if len(vals) == 0:
            return None
        ll = np.asarray(pc.list_value_length(lists).fill_null(0), np.int64)
        ids = np.asarray(b[id_col], np.int64)
        doc = np.repeat(ids, ll)
        tok = vals.to_pandas().values
        f = pd.DataFrame({"doc": doc, "tok": tok})
        return f[f.tok != ""]

    def df_partial(b: pa.Table) -> pa.Table:
        f = _tok_frame(b)
        empty = pa.table(
            {"tkey": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
        )
        if f is None or len(f) == 0:
            return empty
        distinct = f.drop_duplicates(["doc", "tok"])
        vc = distinct["tok"].value_counts()
        tkeys = np.fromiter(
            map(_token_key, vc.index), dtype=np.int64, count=len(vc)
        )
        return pa.table(
            {
                "tkey": pa.array(tkeys),
                "cnt": pa.array(vc.to_numpy().astype(np.int64)),
            }
        )

    df_agg = (
        ds.map_batches(
            df_partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        )
        .groupby("tkey")
        .sum("cnt")
    )
    kc, vc_ = [], []
    n_df = 0
    for b in df_agg.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0 or "sum(cnt)" not in b.column_names:
            continue
        cnt = np.asarray(b["sum(cnt)"], np.int64)
        mask = cnt >= 2  # df=1 tokens are implicit misses — not shipped
        kc.append(np.asarray(b["tkey"], np.int64)[mask])
        vc_.append(cnt[mask])
        n_df += int(mask.sum())
        if n_df > df_broadcast_limit:
            raise ValueError(
                "tfidf_top_terms: repeated-vocab df table exceeds "
                f"df_broadcast_limit={df_broadcast_limit}; run "
                "boilerplate/line dedup first or raise the limit"
            )
    keys = np.concatenate(kc) if kc else np.empty(0, np.int64)
    dfs = np.concatenate(vc_) if vc_ else np.empty(0, np.int64)
    order = np.argsort(keys)
    ref = ray.put((keys[order], dfs[order]))

    def topk(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
        )
        f = _tok_frame(b)
        if f is None or len(f) == 0:
            return empty
        tf = (
            f.groupby(["doc", "tok"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        km, dm = cached_get(ref)
        tkeys = np.fromiter(
            map(_token_key, tf["tok"]), dtype=np.int64, count=len(tf)
        )
        if len(km):
            pos = np.clip(np.searchsorted(km, tkeys), 0, len(km) - 1)
            dfv = np.where(km[pos] == tkeys, dm[pos], 1)
        else:
            dfv = np.ones(len(tf), np.int64)
        tf["df"] = dfv.astype(np.int64)
        tf["score"] = tf["tf"].to_numpy() / tf["df"].to_numpy()
        tf = tf.sort_values(
            ["doc", "score", "tf", "tok"],
            ascending=[True, False, False, True],
            kind="mergesort",
        )
        tf["rnk"] = tf.groupby("doc", sort=False).cumcount() + 1
        tf = tf[tf["rnk"] <= k_top]
        return pa.table(
            {
                id_col: pa.array(tf["doc"].to_numpy(), pa.int64()),
                "token": pa.array(tf["tok"].to_numpy(), pa.string()),
                "tf": pa.array(tf["tf"].to_numpy().astype(np.int64)),
                "df": pa.array(tf["df"].to_numpy().astype(np.int64)),
                "rnk": pa.array(tf["rnk"].to_numpy().astype(np.int64)),
            }
        )

    return ds.map_batches(
        topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def length_quantile_filter(
    ds: Dataset,
    low_q: float = 0.10,
    high_q: float = 0.99,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Corpus-adaptive length filter: keep documents whose token count
    lies within the corpus's own [low_q, high_q] discrete quantiles —
    thresholds derived from the data (the :func:`doc_length_quantiles`
    calibration applied as a filter), not guessed constants.

    Two phases, both scale-safe: (1) the bounded distinct-length
    histogram comes to the driver and yields the two int thresholds
    (exact, same ceil-rank rule as DuckDB ``quantile_disc``); (2) one
    streaming vectorized filter pass — the thresholds ride in the task
    closure, nothing is re-shuffled. → (id_col, n_tok) kept rows.
    """
    import pyarrow.compute as pc

    q = doc_length_quantiles(ds, quantiles=(low_q, high_q), text_col=text_col)
    lo = q[f"p{int(low_q * 100)}"][0].as_py()
    hi = q[f"p{int(high_q * 100)}"][0].as_py()

    def kernel(b: pa.Table) -> pa.Table:
        text = b[text_col]
        n_tok = pc.cast(
            pc.count_substring_regex(text, pattern=r"[^ \t\n\f\r]+"),
            pa.int64(),
        )
        t = pa.table({id_col: b[id_col], "n_tok": n_tok})
        if lo is None:
            return t.slice(0, 0)
        mask = pc.and_(
            pc.greater_equal(n_tok, pa.scalar(lo, pa.int64())),
            pc.less_equal(n_tok, pa.scalar(hi, pa.int64())),
        )
        return t.filter(pc.fill_null(mask, False))

    return ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def rare_token_stats(
    ds: Dataset,
    rare_max: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_parts: int | None = None,
) -> Dataset:
    """Corpus-frequency token statistics per document — the unigram
    quality signal (documents dominated by corpus-rare tokens are OCR
    noise / mojibake candidates; KenLM-style scoring's integer-exact
    little sibling). → (doc_id, n_tok, n_rare, min_freq, mean_freq)
    where freq is each token's CORPUS instance count, n_rare counts
    instances with freq ≤ ``rare_max``, and mean_freq is one double
    division of two int64 sums (bit-identical to the oracle).

    Shape: one vectorized tokenize pass to (doc, token, tf) rows, then a
    single token-hash exchange — because a partition holds ALL instances
    of its tokens, each token's global frequency is computed locally
    (no separate freq table, no join) — emitting per-(partition, doc)
    partial sums, finished by one vocab-bounded groupby(doc). Content
    never shuffles; the exchange carries (doc, token, tf) rows.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.partitioning import (
        dataset_num_parts,
        key_part_column,
        string_hash_impl,
    )
    from ray.data.aggregate import Min, Sum

    if num_parts is None:
        num_parts = dataset_num_parts(
            ds, bytes_per_row=200, target_bytes=32 << 20
        )
    hash_impl = string_hash_impl()

    def doc_tokens(b: pa.Table) -> pa.Table:
        text = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray
        ) else b[text_col]
        lists = pc.split_pattern_regex(text, pattern=r"[ \t\n\f\r]+")
        lists = lists.combine_chunks() if isinstance(
            lists, pa.ChunkedArray
        ) else lists
        flat = lists.flatten()
        parents = pc.list_parent_indices(lists)
        ids = pc.take(b[id_col], parents)
        keep = pc.not_equal(flat, "")
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
            }
        )
        if len(flat) == 0:
            return empty.append_column("part", pa.array([], pa.int64()))
        df = pd.DataFrame(
            {
                id_col: np.asarray(pc.cast(ids, pa.int64())),
                "token": flat.to_pandas(),
            }
        )[np.asarray(keep)]
        if len(df) == 0:
            return empty.append_column("part", pa.array([], pa.int64()))
        g = (
            df.groupby([id_col, "token"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        t = pa.table(
            {
                id_col: pa.array(g[id_col].to_numpy(), pa.int64()),
                "token": pa.array(g["token"].to_numpy(), pa.string()),
                "tf": pa.array(g["tf"].to_numpy().astype(np.int64)),
            }
        )
        return t.append_column(
            "part", key_part_column(t["token"], num_parts, impl=hash_impl)
        )

    toks = ds.map_batches(
        doc_tokens, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def local_stats(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "n_tok": pa.array([], pa.int64()),
                "n_rare": pa.array([], pa.int64()),
                "min_f": pa.array([], pa.int64()),
                "sum_f": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0 or "token" not in g.column_names:
            return empty
        df = g.to_pandas()
        # the partition holds every instance of its tokens → global freq
        df["f"] = df.groupby("token", sort=False)["tf"].transform("sum")
        df["w"] = df["tf"] * df["f"]
        df["rare"] = np.where(df["f"] <= rare_max, df["tf"], 0)
        out = df.groupby(id_col, sort=False).agg(
            n_tok=("tf", "sum"),
            n_rare=("rare", "sum"),
            min_f=("f", "min"),
            sum_f=("w", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(
            out.astype("int64"), preserve_index=False
        )

    partials = hash_exchange(toks, "part", local_stats, num_parts)
    agg = partials.groupby(id_col).aggregate(
        Sum("n_tok", alias_name="n_tok"),
        Sum("n_rare", alias_name="n_rare"),
        Min("min_f", alias_name="min_freq"),
        Sum("sum_f", alias_name="sum_f"),
    )

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_tok" not in b.column_names:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tok": pa.array([], pa.int64()),
                    "n_rare": pa.array([], pa.int64()),
                    "min_freq": pa.array([], pa.int64()),
                    "mean_freq": pa.array([], pa.float64()),
                }
            )
        n_tok = pc.cast(b["n_tok"], pa.int64())
        sum_f = pc.cast(b["sum_f"], pa.int64())
        return pa.table(
            {
                id_col: b[id_col],
                "n_tok": n_tok,
                "n_rare": pc.cast(b["n_rare"], pa.int64()),
                "min_freq": pc.cast(b["min_freq"], pa.int64()),
                "mean_freq": pc.divide(
                    pc.cast(sum_f, pa.float64()),
                    pc.cast(n_tok, pa.float64()),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def rollup_stats(
    ds: Dataset,
    dims: tuple[str, str] = ("lang", "source"),
    measure: str = "n_chars",
) -> pa.Table:
    """GROUPING-SETS rollup — counts and measure sums at every
    aggregation level ((a,b), (a), (b), ()) in ONE pass: the combiner
    shuffle carries only (a, b, partial_count, partial_sum) rows, the
    finest level lands on the driver (bounded by |a|×|b| group
    cardinality by contract), and the coarser levels fold from it
    exactly — integer arithmetic, no re-scan per level. NULL marks an
    aggregated-out dimension, as SQL GROUPING SETS does.

    NULL *data* values in a dimension are real groups (GROUPING SETS
    semantics): they ride the shuffle as a sentinel string so pandas
    groupby can't drop them, and decode back to NULL in the output —
    which, like SQL without GROUPING(), renders a null data group and
    an aggregated-out marker identically.

    → (dims[0], dims[1], n_docs, sum_<measure>) pa.Table.
    """
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    a, b = dims
    _NULLDIM = "\x00<null-dim>"  # \x00 can't occur in real dim strings

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                a: t[a].to_pandas().fillna(_NULLDIM),
                b: t[b].to_pandas().fillna(_NULLDIM),
                "m": np.asarray(pc.cast(t[measure], pa.int64())),
            }
        )
        g = df.groupby([a, b], sort=False).agg(
            cnt=("m", "size"), s=("m", "sum")
        ).reset_index()
        return pa.table(
            {
                a: pa.array(g[a].to_numpy(), pa.string()),
                b: pa.array(g[b].to_numpy(), pa.string()),
                "cnt": pa.array(g["cnt"].to_numpy().astype(np.int64)),
                "s": pa.array(g["s"].to_numpy().astype(np.int64)),
            }
        )

    fine = (
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .groupby([a, b])
        .sum(["cnt", "s"])
        .take_all()
    )  # bounded by group cardinality
    df = pd.DataFrame(
        [
            {
                a: r[a],
                b: r[b],
                "n_docs": int(r["sum(cnt)"]),
                "sum_m": int(r["sum(s)"]),
            }
            for r in fine
        ]
    )
    levels = [df]
    for keep in ([a], [b], []):
        g = (
            df.groupby(keep, sort=False)[["n_docs", "sum_m"]].sum().reset_index()
            if keep
            else pd.DataFrame(
                {"n_docs": [df["n_docs"].sum()], "sum_m": [df["sum_m"].sum()]}
            )
        )
        for missing in (c for c in (a, b) if c not in keep):
            g[missing] = None
        levels.append(g[[a, b, "n_docs", "sum_m"]])
    allrows = pd.concat(levels, ignore_index=True)

    def _decode(vals: list) -> list:
        return [None if v == _NULLDIM else v for v in vals]

    return pa.table(
        {
            a: pa.array(_decode(allrows[a].tolist()), pa.string()),
            b: pa.array(_decode(allrows[b].tolist()), pa.string()),
            "n_docs": pa.array(
                allrows["n_docs"].to_numpy().astype("int64")
            ),
            f"sum_{measure}": pa.array(
                allrows["sum_m"].to_numpy().astype("int64")
            ),
        }
    )


def group_length_quantiles(
    ds: Dataset,
    group_col: str = "lang",
    quantiles: tuple[float, ...] = (0.25, 0.50, 0.75),
    text_col: str = "text",
) -> pa.Table:
    """Exact per-group token-length quantiles — the per-domain
    calibration view of :func:`doc_length_quantiles` (each language /
    source gets its own length thresholds). Same shape guarantee: the
    combiner shuffle carries (group, length, count) rows — bounded by
    groups × distinct lengths, never docs — and the driver applies the
    ceil-rank ``quantile_disc`` rule per group over the cumulative
    counts. → (group_col, p25, p50, p75, n_docs) pa.Table.
    """
    import math

    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        text = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray
        ) else b[text_col]
        n_tok = pc.cast(
            pc.count_substring_regex(text, pattern=r"[^ \t\n\f\r]+"),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                "g": b[group_col].to_pandas(),
                "n": np.asarray(n_tok, dtype="float64"),
            }
        ).dropna(subset=["n"])
        if len(df) == 0:
            return pa.table(
                {
                    "g": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        vc = (
            df.astype({"n": "int64"})
            .groupby(["g", "n"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                "g": pa.array(vc["g"].to_numpy(), pa.string()),
                "n": pa.array(vc["n"].to_numpy(), pa.int64()),
                "cnt": pa.array(vc["cnt"].to_numpy().astype(np.int64)),
            }
        )

    rows = (
        ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .groupby(["g", "n"])
        .sum("cnt")
        .take_all()
    )  # bounded by groups × distinct lengths
    by_g: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append((int(r["n"]), int(r["sum(cnt)"])))
    out: dict[str, list] = {group_col: []}
    for q in quantiles:
        out[f"p{int(q * 100)}"] = []
    out["n_docs"] = []
    for gname in sorted(by_g):
        vc = by_g[gname]
        ns = np.array([x[0] for x in vc], dtype=np.int64)
        cs = np.array([x[1] for x in vc], dtype=np.int64)
        order = np.argsort(ns)
        ns, cs = ns[order], cs[order]
        cum = np.cumsum(cs)
        total = int(cum[-1])
        out[group_col].append(gname)
        for q in quantiles:
            rank = max(1, math.ceil(q * total))
            idx = int(np.searchsorted(cum, rank, side="left"))
            out[f"p{int(q * 100)}"].append(int(ns[idx]))
        out["n_docs"].append(total)
    return pa.table(
        {
            group_col: pa.array(out[group_col], pa.string()),
            **{
                f"p{int(q * 100)}": pa.array(
                    out[f"p{int(q * 100)}"], pa.int64()
                )
                for q in quantiles
            },
            "n_docs": pa.array(out["n_docs"], pa.int64()),
        }
    )
