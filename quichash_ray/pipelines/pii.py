"""PII detection and redaction over an (id, text) table.

Stateless vectorized map_batches stage: counts and redacts email addresses,
IPv4 addresses, and SSN-shaped identifiers. Both the engine (pyarrow.compute
``count_substring_regex`` / ``replace_substring_regex``) and the DuckDB
oracle (``regexp_extract_all`` / ``regexp_replace(..., 'g')``) run RE2, so
match semantics — non-overlapping leftmost matches, ``\\b`` word boundaries
— are identical by construction and the comparison is hash-exact.

Counts are taken on the ORIGINAL text; redactions are applied sequentially
email -> ipv4 -> ssn (the replacement tokens contain no digits or ``@``, so
later passes cannot re-match earlier redactions). Null text yields null
clean_text and zero counts.

Scale: one streaming pass, zero shuffles, zero state — the cheapest possible
Ray Data stage shape. Reference analog: none (hashing tool); graft-mandate
training-data hygiene operator alongside gopher_quality / decontaminate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# RE2-compatible patterns, mirrored literally in the oracle SQL
# (__ray_entry__.oracle_sql()["pii_scrub"]). Keep the two in sync.
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"

_PASSES = (
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_ipv4", IPV4_RE, "<IP>"),
    ("n_ssn", SSN_RE, "<SSN>"),
)


def pii_scrub(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """→ (id, n_emails, n_ipv4, n_ssn, clean_text)."""

    def kernel(b: pa.Table) -> pa.Table:
        text = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray
        ) else b[text_col]
        cols: dict[str, pa.Array | pa.ChunkedArray] = {id_col: b[id_col]}
        clean = text
        for name, pattern, token in _PASSES:
            counted = pc.count_substring_regex(text, pattern)
            cols[name] = pc.cast(
                pc.coalesce(counted, pa.scalar(0, counted.type)), pa.int64()
            )
            clean = pc.replace_substring_regex(clean, pattern, token)
        cols["clean_text"] = clean
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
