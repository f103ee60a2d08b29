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
    normalize_for_fingerprint,
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

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


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

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


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

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)


def fingerprints(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """→ (id, fingerprint) — md5 of the whitespace-normalized, lowercased
    text: a deterministic near-canonical document fingerprint."""

    def kernel(b: pa.Table) -> pa.Table:
        fps = [
            None
            if t is None
            else hashlib.md5(
                normalize_for_fingerprint(t).encode("utf-8")
            ).hexdigest()
            for t in b[text_col].to_pylist()
        ]
        return pa.table(
            {id_col: b[id_col], "fingerprint": pa.array(fps, pa.string())}
        )

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True)
