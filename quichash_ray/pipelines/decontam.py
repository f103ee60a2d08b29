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
    """(exact sha256 hex, fingerprint md5 hex) of one document — scalar
    reference form; batch paths use :func:`_batch_key_digests` (same
    semantics, vectorized normalize + zero-copy views)."""
    return (
        hashlib.sha256(text.encode("utf-8")).hexdigest(),
        hashlib.md5(
            normalize_for_fingerprint(text).encode("utf-8")
        ).hexdigest(),
    )


def _batch_key_digests(
    b: pa.Table, text_col: str
) -> tuple[list[bytes | None], list[bytes | None]]:
    """Per-row (raw sha256 of text, raw md5 of normalized text).

    The digest-stage shape (stages/digest.py): one vectorized RE2 normalize
    pass over the column, zero-copy memoryviews over both Arrow data
    buffers, and a per-row loop whose only body is the hashlib C call —
    replaces the round-3 ``to_pylist()`` + per-row Python-regex normalize.
    Nulls map to None in both lists.
    """
    from quichash_ray.functions.text import normalize_fp_array
    from quichash_ray.stages.digest import content_byte_views

    raw_views, _ = content_byte_views(b, text_col)
    norm_views, _ = content_byte_views(
        pa.table({"t": normalize_fp_array(b[text_col])}), "t"
    )
    sha = [
        None if v is None else hashlib.sha256(v).digest() for v in raw_views
    ]
    fp = [
        None if v is None else hashlib.md5(v).digest() for v in norm_views
    ]
    return sha, fp


def _member_sorted(sorted_arr: "np.ndarray", probes: "np.ndarray"):
    """Vectorized membership of ``probes`` in a sorted unique array."""
    if len(sorted_arr) == 0 or len(probes) == 0:
        return np.zeros(len(probes), dtype=bool)
    pos = np.clip(np.searchsorted(sorted_arr, probes), 0, len(sorted_arr) - 1)
    return sorted_arr[pos] == probes


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
        return _decontaminate_join(train, test, text_col, id_col, emit)

    @ray.remote
    def block_keys(t: pa.Table):
        sha, fp = _batch_key_digests(t, text_col)
        valid = [i for i, v in enumerate(sha) if v is not None]
        if not valid:
            return np.empty(0, "S32"), np.empty(0, "S16")
        return (
            np.frombuffer(b"".join(sha[i] for i in valid), "S32"),
            np.frombuffer(b"".join(fp[i] for i in valid), "S16"),
        )

    parts = ray.get(
        [block_keys.remote(r) for r in test.to_arrow_refs()]
    )
    sha_arr = (
        np.unique(np.concatenate([p[0] for p in parts]))
        if parts
        else np.empty(0, "S32")
    )
    fp_arr = (
        np.unique(np.concatenate([p[1] for p in parts]))
        if parts
        else np.empty(0, "S16")
    )
    keys_ref = ray.put((sha_arr, fp_arr))

    def classify(b: pa.Table) -> pa.Table:
        from quichash_ray.stages.broadcast import cached_get

        shas, fps = cached_get(keys_ref)  # sorted unique raw digests
        sha, fp = _batch_key_digests(b, text_col)
        n = b.num_rows
        nullpad32, nullpad16 = b"\xff" * 32, b"\xff" * 16
        dg = np.frombuffer(
            b"".join(v if v is not None else nullpad32 for v in sha), "S32"
        ) if n else np.empty(0, "S32")
        fg = np.frombuffer(
            b"".join(v if v is not None else nullpad16 for v in fp), "S16"
        ) if n else np.empty(0, "S16")
        isnull = np.fromiter(
            (v is None for v in sha), dtype=bool, count=n
        ) if n else np.empty(0, bool)
        exact = _member_sorted(shas, dg) & ~isnull
        fphit = _member_sorted(fps, fg) & ~isnull & ~exact
        hit = exact | fphit
        if emit == "clean":
            return b.filter(pa.array(~hit))
        reason = np.where(exact, "exact", "fingerprint")
        out = pa.table(
            {
                id_col: b[id_col],
                "reason": pa.array(reason.tolist(), pa.string()),
            }
        )
        return out.filter(pa.array(hit))

    return train.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


_NGRAM_TOKEN_RE = None  # compiled lazily per worker


def _doc_gram_hashes(text: str, k: int) -> "np.ndarray":
    """distinct md5 raw digests ('S16') of the k-token-grams of one doc."""
    global _NGRAM_TOKEN_RE
    if _NGRAM_TOKEN_RE is None:
        import re

        _NGRAM_TOKEN_RE = re.compile(r"\S+")
    toks = _NGRAM_TOKEN_RE.findall(text)
    n = len(toks) - k + 1
    if n <= 0:
        return np.empty(0, "S16")
    return np.unique(
        np.frombuffer(
            b"".join(
                hashlib.md5(
                    " ".join(toks[i : i + k]).encode("utf-8")
                ).digest()
                for i in range(n)
            ),
            "S16",
        )
    )


def ngram_decontaminate(
    train: Dataset,
    test: Dataset,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = 50_000_000,
) -> Dataset:
    """GPT-3-style n-gram overlap decontamination: a training document is
    contaminated if it shares ANY k-token-gram with the eval corpus —
    the quote-level tier the exact/fingerprint tiers miss (an eval
    passage embedded inside a larger training doc). → (id, n_shared):
    contaminated train docs with their DISTINCT shared-gram counts.

    Tiers, same discipline as :func:`decontaminate`: the eval gram-hash
    set (md5 raw, 16 B/gram) broadcasts once while it fits
    ``broadcast_limit`` grams — train streams with zero shuffles; above
    the limit a co-partitioned (gram, kind) join decides membership per
    partition and per-doc counts reduce through one id-keyed exchange
    (each distinct (doc, gram) row lands in exactly one gram partition,
    so summed partials equal the distinct shared count). Both tiers
    equivalence-tested.
    """
    import ray

    test = test.materialize()

    @ray.remote
    def block_grams(t: pa.Table) -> np.ndarray:
        parts = [
            _doc_gram_hashes(txt, k)
            for txt in t[text_col].to_pylist()
            if txt is not None
        ]
        return (
            np.unique(np.concatenate(parts)) if parts else np.empty(0, "S16")
        )

    @ray.remote
    def part_len(a: np.ndarray) -> int:
        return len(a)

    # the tier decision must NOT require driver-materializing the gram
    # set it is deciding about: per-part counts are fetched remotely and
    # their sum (an overestimate — cross-block dups counted twice, which
    # only errs toward the always-works join tier) gates the broadcast
    refs = [block_grams.remote(r) for r in test.to_arrow_refs()]
    if sum(ray.get([part_len.remote(r) for r in refs])) > broadcast_limit:
        return _ngram_decontaminate_join(
            train, test, k, text_col, id_col
        )
    gram_parts = ray.get(refs)
    eval_grams = (
        np.unique(np.concatenate(gram_parts))
        if gram_parts
        else np.empty(0, "S16")
    )
    gram_ref = ray.put(eval_grams)

    def classify(b: pa.Table) -> pa.Table:
        from quichash_ray.stages.broadcast import cached_get

        grams = cached_get(gram_ref)
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        out_id, out_n = [], []
        for rid, txt in zip(ids, texts):
            if txt is None or not len(grams):
                continue
            g = _doc_gram_hashes(txt, k)
            if not len(g):
                continue
            pos = np.clip(np.searchsorted(grams, g), 0, len(grams) - 1)
            n_shared = int((grams[pos] == g).sum())
            if n_shared:
                out_id.append(rid)
                out_n.append(n_shared)
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "n_shared": pa.array(out_n, pa.int64()),
            }
        )

    return train.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def _ngram_decontaminate_join(
    train: Dataset,
    test: Dataset,
    k: int,
    text_col: str,
    id_col: str,
    num_parts: int | None = None,
) -> Dataset:
    """Giant-eval tier for :func:`ngram_decontaminate`: co-partitioned
    gram join + per-doc count reduction, nothing broadcast."""
    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.partitioning import choose_num_parts

    if num_parts is None:
        num_parts = choose_num_parts(
            train.count() + test.count(), bytes_per_row=512,
            target_bytes=64 << 20,
        )
    P = np.uint64(num_parts)

    def emit(b: pa.Table, kind: int) -> pa.Table:
        ids = b[id_col].to_pylist() if kind == 1 else [None] * b.num_rows
        texts = b[text_col].to_pylist()
        out_g, out_id = [], []
        for rid, txt in zip(ids, texts):
            if txt is None:
                continue
            g = _doc_gram_hashes(txt, k)
            out_g.append(g)
            out_id.append(np.full(len(g), rid if rid is not None else 0, np.int64))
        if not out_g:
            return pa.table(
                {
                    "gram": pa.nulls(0, pa.binary(16)),
                    "rid": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int8()),
                    "part": pa.array([], pa.int64()),
                }
            )
        grams = np.concatenate(out_g)
        rids = np.concatenate(out_id)
        lead = np.ascontiguousarray(
            grams.view(np.uint8).reshape(-1, 16)[:, :8]
        ).view(np.uint64).reshape(-1)
        # NB: grams[i].tobytes() would strip trailing NULs ('S' dtype
        # semantics) — build the fixed-width column from the raw buffer
        gram_col = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(16), len(grams), [None, pa.py_buffer(grams.tobytes())]
        )
        return pa.table(
            {
                "gram": gram_col,
                "rid": pa.array(rids),
                "kind": pa.array(np.full(len(grams), kind, np.int8)),
                "part": pa.array((lead % P).astype(np.int64)),
            }
        )

    left = test.map_batches(
        lambda b: emit(b, 0), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    right = train.map_batches(
        lambda b: emit(b, 1), batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )

    def match(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"rid": pa.array([], pa.int64()), "partial": pa.array([], pa.int64())}
        )
        if g.num_rows == 0 or "kind" not in g.column_names:
            return empty
        kind = np.asarray(g["kind"], np.int8)
        ev = g.filter(pa.array(kind == 0))
        tr = g.filter(pa.array(kind == 1))
        if ev.num_rows == 0 or tr.num_rows == 0:
            return empty
        eg = np.unique(
            np.frombuffer(b"".join(ev["gram"].to_pylist()), "S16")
        )
        tg = np.frombuffer(b"".join(tr["gram"].to_pylist()), "S16")
        pos = np.clip(np.searchsorted(eg, tg), 0, len(eg) - 1)
        hit = eg[pos] == tg
        rids = np.asarray(tr["rid"], np.int64)[hit]
        if not len(rids):
            return empty
        uniq, cnt = np.unique(rids, return_counts=True)
        return pa.table(
            {
                "rid": pa.array(uniq, pa.int64()),
                "partial": pa.array(cnt.astype(np.int64)),
            }
        )

    matched = hash_exchange([left, right], "part", match, num_parts)

    def id_part(b: pa.Table) -> pa.Table:
        rid = np.asarray(b["rid"], np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            part = (rid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        return b.append_column(
            "part", pa.array((part % np.uint64(num_parts)).astype(np.int64))
        )

    def reduce_counts(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {id_col: pa.array([], pa.int64()), "n_shared": pa.array([], pa.int64())}
        )
        if g.num_rows == 0 or "rid" not in g.column_names:
            return empty
        rid = np.asarray(g["rid"], np.int64)
        partial = np.asarray(g["partial"], np.int64)
        order = np.argsort(rid, kind="stable")
        rid, partial = rid[order], partial[order]
        starts = np.flatnonzero(
            np.concatenate(([True], rid[1:] != rid[:-1]))
        )
        sums = np.add.reduceat(partial, starts)
        return pa.table(
            {
                id_col: pa.array(rid[starts], pa.int64()),
                "n_shared": pa.array(sums.astype(np.int64)),
            }
        )

    return hash_exchange(
        matched.map_batches(
            id_part, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ),
        "part",
        reduce_counts,
        num_parts,
    )


def _decontaminate_join(
    train: Dataset,
    test: Dataset,
    text_col: str,
    id_col: str,
    emit: str,
) -> Dataset:
    """Giant-eval-set tier: co-partitioned key join, nothing broadcast.

    Both sides emit (tier, key) rows — tier 0 = raw sha256 (32 B), tier 1
    = raw fingerprint md5 (16 B) — hash-partitioned on the key's leading
    8 bytes (keys are cryptographic, so the prefix is uniform). Membership
    is decided per partition with a sorted fixed-width compare; matched
    (id, tier) rows reduce per id with exact (tier 0) winning. ``clean``
    anti-joins the matched ids back against the training rows, again
    co-partitioned. Volumes: 48 B/row key exchange + |matched| id rows —
    proportional to the inputs, with no corpus-wide driver or worker state.
    Equivalence-tested against the broadcast path.
    """
    import ray  # noqa: F401  (parity with broadcast path; exchanges are Datasets)

    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.pairverify import binary_col_parts
    from quichash_ray.stages.partitioning import choose_num_parts

    train = train.materialize()
    num_parts = choose_num_parts(
        train.count() + test.count(), bytes_per_row=96, target_bytes=64 << 20
    )
    W = {0: 32, 1: 16}  # tier → key width (sha256 / md5 raw digests)

    def _key_part(keys_u8: np.ndarray, offs: np.ndarray) -> np.ndarray:
        """leading 8 bytes of each key → partition id."""
        lead = np.stack(
            [keys_u8[offs[:-1] + j] for j in range(8)], axis=1
        ).copy()
        return (
            lead.view(np.uint64).reshape(-1) % np.uint64(num_parts)
        ).astype(np.int64)

    def _emit_keys(b: pa.Table, kind: int) -> pa.Table:
        # vectorized key emission (digest-stage shape): all tier-0 rows,
        # then all tier-1 rows — within-partition order is irrelevant to
        # the downstream sorted-membership + per-id reduce
        sha, fp = _batch_key_digests(b, text_col)
        valid = [i for i, v in enumerate(sha) if v is not None]
        nv = len(valid)
        sha_cat = b"".join(sha[i] for i in valid)
        fp_cat = b"".join(fp[i] for i in valid)
        offs = np.empty(2 * nv + 1, np.int64)
        offs[: nv + 1] = np.arange(nv + 1, dtype=np.int64) * 32
        offs[nv + 1 :] = nv * 32 + np.arange(1, nv + 1, dtype=np.int64) * 16
        key_arr = pa.Array.from_buffers(
            pa.large_binary(),
            2 * nv,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(sha_cat + fp_cat)],
        )
        tier = np.empty(2 * nv, np.int8)
        tier[:nv] = 0
        tier[nv:] = 1
        if kind == 1:
            ids_np = np.asarray(
                b[id_col].combine_chunks()
                if isinstance(b[id_col], pa.ChunkedArray)
                else b[id_col],
                dtype=np.int64,
            )[valid]
            rid = pa.array(np.concatenate([ids_np, ids_np]), pa.int64())
        else:
            rid = pa.nulls(2 * nv, pa.int64())
        vals, offs_np = binary_col_parts(key_arr)
        part = _key_part(vals, offs_np) if nv else np.empty(0, np.int64)
        return pa.table(
            {
                "key": key_arr,
                "tier": pa.array(tier),
                "kind": pa.array(np.full(2 * nv, kind, np.int8)),
                "rid": rid,
                "part": pa.array(part),
            }
        )

    test_keys = test.map_batches(
        lambda b: _emit_keys(b, 0), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    train_keys = train.map_batches(
        lambda b: _emit_keys(b, 1), batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def _fixed_keys(tbl: pa.Table, w: int) -> np.ndarray:
        vals, offs = binary_col_parts(tbl["key"])
        if len(offs) <= 1:
            return np.empty(0, f"S{w}")
        return np.ascontiguousarray(vals[offs[0] : offs[-1]]).view(f"S{w}")

    def match(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"rid": pa.array([], pa.int64()), "tier": pa.array([], pa.int8())}
        )
        if g.num_rows == 0 or "kind" not in g.column_names:
            return empty
        kind = np.asarray(g["kind"], np.int8)
        tier = np.asarray(g["tier"], np.int8)
        out_ids, out_tiers = [], []
        for t, w in W.items():
            probe = g.filter(pa.array((kind == 0) & (tier == t)))
            cand = g.filter(pa.array((kind == 1) & (tier == t)))
            if probe.num_rows == 0 or cand.num_rows == 0:
                continue
            tk = np.unique(_fixed_keys(probe, w))
            ck = _fixed_keys(cand, w)
            pos = np.clip(np.searchsorted(tk, ck), 0, len(tk) - 1)
            hit = tk[pos] == ck
            ids = np.asarray(cand["rid"], np.int64)[hit]
            out_ids.append(ids)
            out_tiers.append(np.full(len(ids), t, np.int8))
        if not out_ids:
            return empty
        return pa.table(
            {
                "rid": pa.array(np.concatenate(out_ids), pa.int64()),
                "tier": pa.array(np.concatenate(out_tiers), pa.int8()),
            }
        )

    matched = hash_exchange(
        [test_keys, train_keys], "part", match, num_parts
    )

    # reduce per id: exact (tier 0) wins when both tiers matched
    def id_part(b: pa.Table) -> pa.Table:
        rid = np.asarray(b["rid"], np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            part = (rid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        return b.append_column(
            "part", pa.array((part % np.uint64(num_parts)).astype(np.int64))
        )

    def reduce_ids(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "reason": pa.array([], pa.string()),
            }
        )
        if g.num_rows == 0 or "rid" not in g.column_names:
            return empty
        rid = np.asarray(g["rid"], np.int64)
        tier = np.asarray(g["tier"], np.int8)
        order = np.lexsort((tier, rid))
        rid, tier = rid[order], tier[order]
        first = np.concatenate(([True], rid[1:] != rid[:-1]))
        rid, tier = rid[first], tier[first]  # min tier per id
        reason = np.where(tier == 0, "exact", "fingerprint")
        return pa.table(
            {
                id_col: pa.array(rid, pa.int64()),
                "reason": pa.array(reason.tolist(), pa.string()),
            }
        )

    removed = hash_exchange(
        matched.map_batches(
            id_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "part",
        reduce_ids,
        num_parts,
    )
    if emit == "removed":
        return removed

    # clean: co-partitioned anti-join of train rows against matched ids
    schema = train.schema()
    names = list(schema.names)
    types = list(schema.types)

    def train_part(b: pa.Table) -> pa.Table:
        cols = {n: b[n] for n in names}
        cols["_kind"] = pa.array(np.ones(b.num_rows, np.int8))
        rid = np.asarray(b[id_col], np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            part = (rid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        cols["part"] = pa.array(
            (part % np.uint64(num_parts)).astype(np.int64)
        )
        return pa.table(cols)

    def removed_part(b: pa.Table) -> pa.Table:
        cols = {}
        for n, t in zip(names, types):
            cols[n] = b[id_col] if n == id_col else pa.nulls(b.num_rows, t)
        cols["_kind"] = pa.array(np.zeros(b.num_rows, np.int8))
        rid = np.asarray(b[id_col], np.int64).view(np.uint64)
        with np.errstate(over="ignore"):
            part = (rid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        cols["part"] = pa.array(
            (part % np.uint64(num_parts)).astype(np.int64)
        )
        return pa.table(cols)

    left = train.map_batches(
        train_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    right = removed.map_batches(
        removed_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def anti(g: pa.Table) -> pa.Table:
        empty = pa.schema(list(zip(names, types))).empty_table()
        if g.num_rows == 0 or "_kind" not in g.column_names:
            return empty
        kind = np.asarray(g["_kind"], np.int8)
        keep_tbl = g.filter(pa.array(kind == 1))
        bad = np.unique(
            np.asarray(g.filter(pa.array(kind == 0))[id_col], np.int64)
        )
        if keep_tbl.num_rows == 0:
            return empty
        ids = np.asarray(keep_tbl[id_col], np.int64)
        if len(bad):
            pos = np.clip(np.searchsorted(bad, ids), 0, len(bad) - 1)
            keep_tbl = keep_tbl.filter(pa.array(bad[pos] != ids))
        return keep_tbl.select(names)

    return hash_exchange([left, right], "part", anti, num_parts)


def fuzzy_decontaminate(
    train: Dataset,
    test: Dataset,
    k: int = 5,
    threshold_num: int = 1,
    threshold_den: int = 2,
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
    text_col: str = "text",
    gram_cap: int | None = 256,
    num_bands: int = 32,
    num_partitions: int = 16,
) -> Dataset:
    """Fuzzy (shingle-containment) decontamination — the tier above
    :func:`ngram_decontaminate`: an eval document whose text was lightly
    edited before leaking into the training set (token dropout,
    paraphrase fragments) shares no long verbatim 13-gram, but most of
    its k-token shingles survive. A train doc is contaminated by an eval
    doc when the eval doc's DISTINCT k-gram set is ≥ p/q contained in
    the train doc's: q·shared ≥ p·n_eval, int64-exact on both engine and
    oracle.

    → (doc_id, eval_id, shared, n_eval) — one row per contaminated
    (train, eval) pair.

    Shape (cross-corpus variant of ngram.candidate_pair_counts): both
    corpora shingle into (id, gram) rows [stateless map] → one band-key
    shuffle co-locates every gram's rows → per-band vectorized numpy
    cross-join emits eval×train pairs per gram (train-side df > ``gram_cap``
    drops the gram, metered — boilerplate-gram quadratic guard; the eval
    side is bounded by contract: eval corpora are benchmark-sized) →
    groupby(pair) sum → eval gram totals attach via
    :func:`~quichash_ray.stages.lookup.attach_lookup` (broadcast↔join
    tiers). The shuffle carries (gram, id) rows only — never text.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from quichash_ray.pipelines.ngram import gram_totals, shingle_table
    from quichash_ray.stages.lookup import attach_lookup
    from quichash_ray.state.metrics import get_metrics_actor

    metrics = get_metrics_actor()
    cap = gram_cap if gram_cap is not None else np.iinfo(np.int64).max
    p, q = threshold_num, threshold_den

    tr_sh = shingle_table(train, k, id_col, text_col)
    ev_sh = shingle_table(test, k, eval_id_col, text_col)
    ev_totals = gram_totals(ev_sh, eval_id_col)

    def tag(side: int, col: str):
        def f(b: pa.Table) -> pa.Table:
            grams = np.asarray(b["gram"], np.int64)
            band = (grams.view(np.uint64) % np.uint64(num_bands)).astype(
                np.int64
            )
            return pa.table(
                {
                    "rid": b[col],
                    "gram": b["gram"],
                    "side": pa.array(
                        np.full(b.num_rows, side, np.int8)
                    ),
                    "band": pa.array(band),
                }
            )

        return f

    tagged = tr_sh.map_batches(
        tag(1, id_col), batch_format="pyarrow", batch_size=None
    ).union(
        ev_sh.map_batches(
            tag(0, eval_id_col), batch_format="pyarrow", batch_size=None
        )
    )

    def cross_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                id_col: np.empty(0, np.int64),
                eval_id_col: np.empty(0, np.int64),
                "partial": np.empty(0, np.int64),
            }
        )
        grams = g["gram"].to_numpy()
        rids = g["rid"].to_numpy()
        sides = g["side"].to_numpy()
        order = np.lexsort((rids, sides, grams))
        grams, rids, sides = grams[order], rids[order], sides[order]
        uniq, start, cnt = np.unique(
            grams, return_index=True, return_counts=True
        )
        out_t: list[np.ndarray] = []
        out_e: list[np.ndarray] = []
        dropped = 0
        for s, c in zip(start, cnt):
            sd = sides[s : s + c]
            n_ev = int(np.searchsorted(sd, 1))  # sides sorted 0..1
            n_tr = c - n_ev
            if n_ev == 0 or n_tr == 0:
                continue
            if n_tr > cap:
                dropped += 1
                continue
            ev = rids[s : s + n_ev]
            tr = rids[s + n_ev : s + c]
            out_t.append(np.repeat(tr, n_ev))
            out_e.append(np.tile(ev, n_tr))
        if dropped:
            metrics.add.remote("fuzzy_decontam_dropped_grams", dropped)
        if not out_t:
            return empty
        df = pd.DataFrame(
            {id_col: np.concatenate(out_t), eval_id_col: np.concatenate(out_e)}
        )
        counts = df.value_counts([id_col, eval_id_col]).reset_index(
            name="partial"
        )
        return counts.astype(
            {id_col: np.int64, eval_id_col: np.int64, "partial": np.int64}
        )

    shared = (
        tagged.groupby("band")
        .map_groups(cross_pairs, batch_format="pandas")
        .groupby([id_col, eval_id_col])
        .aggregate(Sum("partial", alias_name="shared"))
    )

    with_tot = attach_lookup(
        shared,
        ev_totals,
        key_col=eval_id_col,
        value_col="n_grams",
        out_col="n_eval",
        key_col_in_mapping=eval_id_col,
        num_partitions=num_partitions,
    )

    def flt(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sh = pc.cast(b["shared"], pa.int64())
        ne = pc.cast(b["n_eval"], pa.int64())
        out = pa.table(
            {
                id_col: b[id_col],
                eval_id_col: b[eval_id_col],
                "shared": sh,
                "n_eval": ne,
            }
        )
        return out.filter(
            pc.greater_equal(
                pc.multiply(pa.scalar(q, pa.int64()), sh),
                pc.multiply(pa.scalar(p, pa.int64()), ne),
            )
        )

    return with_tot.map_batches(flt, batch_format="pyarrow", batch_size=None)
