"""Winnowing document fingerprints + clone-pair detection — the MOSS
local-fingerprinting algorithm (Schleimer, Wilkerson, Aiken, SIGMOD 2003)
over token k-grams, the standard source-code plagiarism/clone primitive.

Guarantee inherited from the paper: any shared token run of length
≥ w + k - 1 between two documents yields at least one shared selected
fingerprint, while the selected set is ~2/(w+1) of all grams — position-
robust (unlike head-anchored fingerprints) and far sparser than the full
shingle set the MinHash stages use.

Definitions (mirrored literally by the DuckDB oracles in
``__ray_entry__``):

- tokens: ``\\S+`` runs (the engine-wide whitespace token convention);
- gram i (0-based): ``md5(" ".join(tokens[i : i + k]))`` lowercase hex;
- windows: starts s = 0 .. max(0, n_grams - w); window s covers grams
  [s, s + w) ∩ [0, n_grams) — a doc with fewer than w grams gets the
  single window of all its grams;
- selection per window: minimum hash, RIGHTMOST position on ties (the
  paper's robust-winnowing rule), realized as the minimum of the
  39-byte key ``hex || zfill7(9999999 - i)`` — lexicographic order of
  fixed-width lowercase hex equals numeric order, and the inverted
  position suffix makes ties pick the largest i;
- fingerprints: DISTINCT (pos, hash) over all windows of a doc.

Pair detection reuses the banded inverted-index exchange of
``ngram.candidate_pair_counts`` over the DISTINCT fingerprint-hash set
per doc (hashes truncated to int64 — md5's leading 16 hex chars — for
the integer band shuffle): docs sharing ≥ ``min_shared`` fingerprints
are clone candidates. Per-doc distinctness is established INSIDE the
fingerprint kernel (before any block splitting), so pair counts are
exact however Ray re-blocks the stream.

Scale shape: fingerprinting is a stateless streaming ``map_batches``
(content in, ~2·n_grams/(w+1) fingerprint rows out, content dropped);
pair counting shuffles only (int64 gram, id) rows through the same
banded exchange the n-gram and repo-dedup stages use.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
from ray.data import Dataset

_TOKEN_RE = re.compile(r"\S+")
_POS_PAD = 7
_POS_MAX = 10**_POS_PAD - 1  # 9999999


def _doc_fingerprints(text: str, k: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """one document → (positions int64, fp hex 'S32'), distinct. Selection
    is vectorized: the 39-byte combined keys are winnowed with a
    sliding-window minimum over fixed-width bytes; a combined key encodes
    both fields, so the unique selected keys ARE the distinct (pos, fp)
    set."""
    toks = _TOKEN_RE.findall(text)
    n = len(toks) - k + 1
    if n <= 0:
        return np.empty(0, np.int64), np.empty(0, "S32")
    if n > _POS_MAX + 1:
        # a negative zfill suffix would invert the rightmost-tie order
        # (and diverge from the SQL mirror's lpad) — refuse loudly
        raise ValueError(
            f"document has {n} grams; winnowing's position encoding "
            f"supports at most {_POS_MAX + 1} — split the document"
        )
    keys = np.empty(n, f"S{32 + _POS_PAD}")
    for i in range(n):
        h = hashlib.md5(" ".join(toks[i : i + k]).encode("utf-8")).hexdigest()
        keys[i] = (h + str(_POS_MAX - i).zfill(_POS_PAD)).encode()
    # numpy's minimum ufunc has no bytes loop — rank the (unique) keys and
    # window-min over int64 ranks instead
    order = np.argsort(keys)
    if n <= w:
        sel = keys[order[:1]]
    else:
        rank = np.empty(n, np.int64)
        rank[order] = np.arange(n)
        win_min = np.lib.stride_tricks.sliding_window_view(rank, w).min(axis=1)
        sel = keys[order[np.unique(win_min)]]
    fps = np.empty(len(sel), "S32")
    pos = np.empty(len(sel), np.int64)
    for j, kbytes in enumerate(sel):
        fps[j] = kbytes[:32]
        pos[j] = _POS_MAX - int(kbytes[32:])
    return pos, fps


def winnow_fingerprints(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> Dataset:
    """→ (id, pos, fp): winnowed token-k-gram fingerprints per document.
    Null texts yield no rows (skip-and-count discipline)."""

    def kernel(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        out_id, out_pos, out_fp = [], [], []
        for rid, txt in zip(ids, texts):
            if txt is None:
                continue
            pos, fps = _doc_fingerprints(txt, k, w)
            out_id.append(np.full(len(pos), rid, np.int64))
            out_pos.append(pos)
            out_fp.extend(f.decode() for f in fps)
        if not out_id:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "fp": pa.array([], pa.string()),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "pos": pa.array(np.concatenate(out_pos)),
                "fp": pa.array(out_fp, pa.string()),
            }
        )

    return ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def _fp_gram_table(
    ds: Dataset, text_col: str, id_col: str, k: int, w: int
) -> Dataset:
    """→ (id, gram): DISTINCT int64-truncated fingerprint hashes per doc,
    distinctness established per doc inside the kernel.

    Collision assumption: shared-fp counts and the df cap downstream key on
    these 64-bit truncations of the 128-bit md5 fingerprints (the oracle
    keys on the full 128 bits). A truncation collision between DISTINCT
    grams would inflate a shared count or shift a df past the cap —
    probability ~2^-64 per distinct-gram pair, i.e. negligible until
    corpus-scale distinct-gram counts approach birthday range (~2^32 ≈ 4B
    grams); band on the full 128-bit key if that regime is ever real."""

    def kernel(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        out_id, out_gram = [], []
        for rid, txt in zip(ids, texts):
            if txt is None:
                continue
            _pos, fps = _doc_fingerprints(txt, k, w)
            if not len(fps):
                continue
            # leading 16 hex chars → uint64 → int64 band key
            grams = np.unique(
                np.array(
                    [int(f[:16], 16) for f in np.unique(fps)], np.uint64
                ).astype(np.int64)
            )
            out_id.append(np.full(len(grams), rid, np.int64))
            out_gram.append(grams)
        if not out_id:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "gram": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id)),
                "gram": pa.array(np.concatenate(out_gram)),
            }
        )

    return ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True
    )


def clone_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    num_bands: int = 32,
    fp_cap: int | None = None,
) -> Dataset:
    """→ (id_a, id_b, shared): document pairs sharing ≥ ``min_shared``
    winnowed fingerprints, id_a < id_b. ``fp_cap`` meters out hot
    boilerplate fingerprints exactly like the n-gram stage's gram_cap
    (None = uncapped, the oracle configuration)."""
    import pyarrow.compute as pc

    from quichash_ray.pipelines.ngram import candidate_pair_counts

    grams = _fp_gram_table(ds, text_col, id_col, k, w)
    pairs = candidate_pair_counts(
        grams, id_col=id_col, gram_cap=fp_cap, num_bands=num_bands
    )

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["shared"], min_shared))

    return pairs.map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
