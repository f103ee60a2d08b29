"""Text-analysis kernels — tokenization, quality counts, language ID,
fingerprinting. All vectorized via pyarrow.compute RE2 kernels (the same regex
engine DuckDB uses, so SQL oracles match exactly).

These are the training-data-pipeline operators layered on the dedup engine:
token counting, quality scoring, n-gram language ID, document fingerprinting.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

TOKEN_PATTERN = r"\S+"

# marker stopwords per language; deterministic tie-break order en > de > fr
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|a|of|to|and|in|is)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "fr": r"\b(le|la|les|et|est|une)\b",
}
_LANG_ORDER = ["en", "de", "fr"]

# Exactly RE2's \s = [ \t\n\f\r] (the oracle side: DuckDB regexp_replace
# + trim). Python's \s would also match \v and Unicode whitespace (NBSP,
# U+2028) and silently diverge from the oracle on exotic input — RE2
# deliberately EXCLUDES \v from \s.
_WS_RE = re.compile(r"[ \t\n\f\r]+")


def token_count_array(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace-delimited token count per row (vectorized RE2)."""
    return pc.cast(pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64())


# BPE-ish pre-tokenizer pattern (GPT-2-style, simplified to the subset RE2
# and DuckDB share): letter runs, single digits, punctuation runs
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def bpe_token_count_array(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """BPE-ish token count per row (vectorized RE2): letter runs + single
    digits + punctuation runs — the pre-tokenization granularity a BPE
    vocabulary subdivides, a closer LLM-token proxy than whitespace."""
    return pc.cast(pc.count_substring_regex(text, BPE_PATTERN), pa.int64())


def char_class_counts(
    text: pa.ChunkedArray | pa.Array,
) -> dict[str, pa.Array]:
    """alpha/digit char counts + char length, all int64."""
    return {
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "alpha_chars": pc.cast(
            pc.count_substring_regex(text, r"[A-Za-z]"), pa.int64()
        ),
        "digit_chars": pc.cast(
            pc.count_substring_regex(text, r"[0-9]"), pa.int64()
        ),
    }


def lang_scores(text: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Marker-stopword hit count per language (n-gram-heuristic lang ID)."""
    return {
        lang: pc.cast(pc.count_substring_regex(text, pat), pa.int64())
        for lang, pat in LANG_MARKERS.items()
    }


def predict_lang(scores: dict[str, pa.Array]) -> pa.Array:
    """argmax with deterministic order: en beats de beats fr on ties."""
    best = scores[_LANG_ORDER[0]]
    pred = pa.array(["en"] * len(best), pa.string())
    for lang in _LANG_ORDER[1:]:
        better = pc.greater(scores[lang], best)
        pred = pc.if_else(better, pa.scalar(lang), pred)
        best = pc.if_else(better, scores[lang], best)
    return pred


def normalize_for_fingerprint(s: str) -> str:
    """lowercase + collapse whitespace + trim — the canonical form hashed by
    the document fingerprint (rolling-hash analog; md5 of normal form).
    Scalar form; hot paths use :func:`normalize_fp_array` (same semantics,
    one RE2 pass over the whole column — equivalence-tested)."""
    return _WS_RE.sub(" ", s.lower()).strip(" ")


def normalize_fp_array(
    text: pa.ChunkedArray | pa.Array,
) -> pa.ChunkedArray | pa.Array:
    """Vectorized :func:`normalize_for_fingerprint` over an Arrow string
    column (nulls propagate). One utf8proc lowercase pass + one RE2
    whitespace-collapse pass + a space trim — replaces the per-row Python
    regex in every fingerprint/decontamination key emission."""
    return pc.utf8_trim(
        pc.replace_substring_regex(
            pc.utf8_lower(text), pattern=r"[ \t\n\f\r]+", replacement=" "
        ),
        characters=" ",
    )


def tokenize(s: str) -> list[str]:
    """Whitespace tokenization (shared with the shingling stage)."""
    return s.split()


def human_size(n: int) -> str:
    """KB/MB/GB/TB formatting for reports — compare.rs:60-74 semantics
    (1024 base, two decimals, bytes unadorned)."""
    size = float(n)
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if size < 1024 or unit == "TB":
            if unit == "B":
                return f"{int(size)} B"
            return f"{size:.2f} {unit}"
        size /= 1024
    return f"{size:.2f} TB"
