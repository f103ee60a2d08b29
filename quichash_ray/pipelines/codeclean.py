"""Source-code comment analysis and stripping over an (id, text) table.

The code-corpus hygiene counterpart of ``pii.pii_scrub``: count and remove
C-style block comments (``/* ... */``), C++/Rust/Go line comments
(``// ...``) and hash line comments (``# ...``) in one stateless
vectorized pass. Both the engine (pyarrow.compute RE2 kernels) and the
DuckDB oracle run the SAME patterns, so semantics are identical by
construction and comparison is hash-exact.

Patterns are regex approximations (a ``//`` inside a string literal
counts as a comment) — the standard tradeoff for corpus-scale statistics
where a per-language parser is not affordable; what matters for the
oracle contract is that both sides share exactly the rules below.

Order matters and is fixed: block comments are removed FIRST (a ``//``
inside ``/* */`` must not split the block), then line comments. Counts
are taken in the same staged order (line-comment counts on the
block-stripped text). ``comment_chars`` is the total matched length in
codepoints, computed as len(text) − len(clean_text) — the stages only
remove text, so the difference telescopes (DuckDB mirror:
``length(text) - length(t3)``).

Scale: one streaming pass, zero shuffles, zero state.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# RE2-compatible, mirrored literally in oracle_sql()["code_comment_stats"]
# / ["strip_comments"]. Keep in sync.
BLOCK_RE = r"/\*([^*]|\*+[^*/])*\*+/"  # classic DFA-safe block comment
LINE_RE = r"//[^\n]*"
HASH_RE = r"#[^\n]*"


def _count(text, pattern: str) -> pa.Array:
    c = pc.count_substring_regex(text, pattern)
    return pc.cast(pc.coalesce(c, pa.scalar(0, c.type)), pa.int64())


def comment_scrub(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """→ (id, n_block, n_line, n_hash, comment_chars, clean_text):
    comment counts per style, total comment codepoints, and the
    comment-stripped text (block → // → # staged removal).
    ``comment_chars`` telescopes: the stages only ever REMOVE text, so
    the total matched length is len(text) − len(clean) — no extra regex
    pass per pattern."""

    def kernel(b: pa.Table) -> pa.Table:
        text = (
            b[text_col].combine_chunks()
            if isinstance(b[text_col], pa.ChunkedArray)
            else b[text_col]
        )
        n_block = _count(text, BLOCK_RE)
        after_block = pc.replace_substring_regex(text, BLOCK_RE, "")
        n_line = _count(after_block, LINE_RE)
        after_line = pc.replace_substring_regex(after_block, LINE_RE, "")
        n_hash = _count(after_line, HASH_RE)
        clean = pc.replace_substring_regex(after_line, HASH_RE, "")
        diff = pc.subtract(pc.utf8_length(text), pc.utf8_length(clean))
        return pa.table(
            {
                id_col: b[id_col],
                "n_block": n_block,
                "n_line": n_line,
                "n_hash": n_hash,
                "comment_chars": pc.cast(
                    pc.coalesce(diff, pa.scalar(0, diff.type)), pa.int64()
                ),
                "clean_text": clean,
            }
        )

    return ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
