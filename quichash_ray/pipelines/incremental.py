"""Tiered incremental dedup — classify a NEW crawl shard against an
EXISTING corpus's digest table without re-reading the old corpus content.

This is the recrawl/append primitive of a web-scale dedup engine: the old
corpus exists only as its digest table (32 B/row metadata, the artifact
``dedup.digest_table`` already produces), and a new shard must be split
into ``dup`` (content already present) vs ``novel`` rows. The reference
covers the two-snapshot diff at file granularity (compare.rs semantics —
see ``dbops.compare_classify``); this generalizes it to content-set
membership against an arbitrarily large prior corpus.

Three tiers, smallest machinery that stays EXACT (selected by old-corpus
size, overridable with ``tier=``):

1. ``broadcast`` (|old| ≤ broadcast_limit) — the sorted raw-digest array
   ships once via ``ray.put``; one streaming pass over new, no shuffle.
2. ``bloom`` (|old| ≤ bloom_limit, default (2^33 bits)/bits_per_key ≈
   5.4e8 keys — the largest corpus the 1-GiB-capped bitmap serves at the
   requested bits/key) — a Bloom bitmap over the old digests
   is built distributed (one partial bitmap per old block, tree OR-reduce)
   and broadcast once (m/8 bytes, ~2 B/key at the default 16 bits/key,
   k=7 ⇒ <1 % false positives). Bloom NEGATIVES are *exactly* novel (no
   false negatives); POSITIVES (true dups + ~1 % FP) are exact-verified:
   the positive digest set broadcasts, the OLD digest table streams once
   against it (confirmed = old ∩ positives), and a final pass over new
   classifies with the confirmed set. No step shuffles; every broadcast
   is bounded (bitmap by the bloom cap; positives ≈ |dups| + FP·|new|).
   If the positives outgrow their broadcast budget the call falls through
   to tier 3, so exactness never depends on the FP rate.
3. ``join`` (anything) — co-partitioned digest join, the
   ``decontam._decontaminate_join`` shape: both sides emit raw-digest key
   rows hash-partitioned on the digest's leading 8 bytes, membership is
   decided per partition. Arbitrarily large both sides; volume = digest
   metadata only, content never rides.

Beyond ``bloom_limit`` keys the capped bitmap can no longer hold the
requested bits/key (FP rate explodes, positives overflow, the bitmap
becomes a pure cost) and at 10^12 keys an uncapped bitmap would outgrow
a worker (⪆250 GB); both regimes belong to tier 3 (or a digest-prefix-
sharded bloom, a straightforward extension).

All three tiers are equivalence-tested; ``incremental_dedup`` output is
identical under any ``tier=``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


# ---------------------------------------------------------------------------
# digest plumbing
# ---------------------------------------------------------------------------


def _hex_to_raw(digest_col) -> np.ndarray:
    """Vectorized lowercase-hex sha256 column → (n, 32) uint8 raw bytes.
    Null digests (skip-and-count rows) must be filtered by the caller."""
    arr = (
        digest_col.combine_chunks()
        if isinstance(digest_col, pa.ChunkedArray)
        else digest_col
    )
    n = len(arr)
    if n == 0:
        return np.empty((0, 32), np.uint8)
    hexes = np.asarray(arr.to_pylist(), dtype="S64")
    u = np.frombuffer(hexes.tobytes(), np.uint8).reshape(n, 64)
    nib = np.where(u >= 97, u - 87, u - 48).astype(np.uint8)  # a-f / 0-9
    return (nib[:, 0::2] << 4) | nib[:, 1::2]


def _raw_to_u64_pair(raw: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, 32) raw digests → two independent uint64 words (bytes 0-7 and
    8-15) for Kirsch-Mitzenmacher double hashing (g_i = h1 + i*h2)."""
    if raw.shape[0] == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    h1 = np.ascontiguousarray(raw[:, :8]).view(np.uint64).reshape(-1)
    h2 = np.ascontiguousarray(raw[:, 8:16]).view(np.uint64).reshape(-1)
    return h1, h2


def _text_digests(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """per-row sha256 raw digests → ((n_valid, 32) uint8, valid row mask).
    hashlib per row is irreducible (same as the digest stage); None texts
    are masked out (skip-and-count: they classify as novel)."""
    valid = np.fromiter((t is not None for t in texts), bool, len(texts))
    digs = b"".join(
        hashlib.sha256(t.encode("utf-8")).digest()
        for t in texts
        if t is not None
    )
    raw = np.frombuffer(digs, np.uint8).reshape(-1, 32)
    return raw, valid


# ---------------------------------------------------------------------------
# bloom construction (distributed partials, tree OR-reduce)
# ---------------------------------------------------------------------------


def _test_bits(words: np.ndarray, h1: np.ndarray, h2: np.ndarray, k: int, mask: np.uint64) -> np.ndarray:
    hit = np.ones(len(h1), bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) & mask
        bit = (
            words[(idx >> np.uint64(6)).astype(np.int64)]
            >> (idx & np.uint64(63))
        ) & np.uint64(1)
        hit &= bit != 0
        if not hit.any():
            break
    return hit


def _bloom_m_bits(n_keys: int, bits_per_key: int) -> int:
    """next power of two ≥ n_keys × bits_per_key, clamped to [2^16, 2^33].
    Power-of-two m lets the index computation mask instead of mod."""
    want = max(1, n_keys) * bits_per_key
    m = 1 << 16
    while m < want and m < (1 << 33):
        m <<= 1
    return m


def build_bloom(
    old_digests: Dataset,
    digest_col: str = "digest",
    bits_per_key: int = 16,
    num_hashes: int = 7,
    n_keys: int | None = None,
):
    """old digest table → (bitmap ObjectRef, m_bits, k).

    Leaf tasks emit the distinct SET-BIT INDICES of their block (k·rows·
    8 B — proportional to the keys, never to m; a full m/8-byte partial
    bitmap per block would push blocks × m bytes of mostly-zero words
    through plasma). Groups of 8 leaves materialize into bitmaps, then a
    fan-in-8 OR tree of raw Ray tasks reduces to one — the Dataset API
    has no bitwise-OR tree aggregate, which is exactly the raw-task
    escape hatch. Driver traffic is one m/8-byte bitmap ref.
    """
    import ray

    old_digests = old_digests.materialize()
    if n_keys is None:
        n_keys = old_digests.count()
    m_bits = _bloom_m_bits(n_keys, bits_per_key)
    mask = np.uint64(m_bits - 1)
    k = num_hashes

    @ray.remote
    def block_indices(tbl: pa.Table) -> np.ndarray:
        col = tbl[digest_col]
        col = col.drop_null() if col.null_count else col
        h1, h2 = _raw_to_u64_pair(_hex_to_raw(col))
        idx = np.empty(len(h1) * k, np.uint64)
        for i in range(k):
            idx[i * len(h1) : (i + 1) * len(h1)] = (
                h1 + np.uint64(i) * h2
            ) & mask
        return np.unique(idx)

    @ray.remote
    def indices_to_bitmap(*parts: np.ndarray) -> np.ndarray:
        words = np.zeros(m_bits // 64, np.uint64)
        for idx in parts:
            np.bitwise_or.at(
                words,
                (idx >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (idx & np.uint64(63)),
            )
        return words

    @ray.remote
    def or_merge(*parts: np.ndarray) -> np.ndarray:
        out = parts[0].copy()
        for p in parts[1:]:
            out |= p
        return out

    leaves = [
        block_indices.remote(r) for r in old_digests.to_arrow_refs()
    ]
    if not leaves:
        return ray.put(np.zeros(m_bits // 64, np.uint64)), m_bits, k
    refs = [
        indices_to_bitmap.remote(*leaves[i : i + 8])
        for i in range(0, len(leaves), 8)
    ]
    while len(refs) > 1:
        refs = [
            or_merge.remote(*refs[i : i + 8])
            for i in range(0, len(refs), 8)
        ]
    return refs[0], m_bits, k


# ---------------------------------------------------------------------------
# the operator
# ---------------------------------------------------------------------------


def incremental_dedup(
    new: Dataset,
    old_digests: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    digest_col: str = "digest",
    emit: str = "classified",
    tier: str | None = None,
    broadcast_limit: int = 5_000_000,
    bloom_limit: int | None = None,
    bits_per_key: int = 16,
    num_hashes: int = 7,
    positive_broadcast_limit: int = 5_000_000,
    num_parts: int | None = None,
) -> Dataset:
    """Classify new rows against the old corpus digest table.

    ``emit="classified"`` → (id, status) for every new row, status ∈
    {dup, novel} (null content → novel, the skip-and-count discipline —
    matches SQL ``sha256(NULL) = anything`` being never-true);
    ``emit="novel"`` → the surviving new rows, all columns.
    ``tier`` forces ``broadcast`` / ``bloom`` / ``join`` (default: pick by
    |old| as the module docstring describes).
    """
    if emit not in ("classified", "novel"):
        raise ValueError(f"emit must be 'classified' or 'novel', got {emit!r}")
    if tier not in (None, "broadcast", "bloom", "join"):
        raise ValueError(f"unknown tier {tier!r}")

    old_digests = old_digests.materialize()
    n_old = old_digests.count()
    if bloom_limit is None:
        # the bloom tier is only honest while the m cap preserves the
        # requested bits/key — past (2^33 bits / bits_per_key) keys the
        # FP rate explodes, positives overflow, and the call would build
        # a useless bitmap before falling through; go straight to join
        bloom_limit = (1 << 33) // bits_per_key
    if tier is None:
        if n_old <= broadcast_limit:
            tier = "broadcast"
        elif n_old <= bloom_limit:
            tier = "bloom"
        else:
            tier = "join"

    if tier == "join":
        return _incremental_join(
            new, old_digests, text_col, id_col, digest_col, emit, num_parts
        )
    if tier == "broadcast":
        confirmed = _old_raw_sorted(old_digests, digest_col)
        return _classify_with_set(new, confirmed, text_col, id_col, emit)

    # bloom tier
    import ray

    bitmap_ref, m_bits, k = build_bloom(
        old_digests, digest_col, bits_per_key, num_hashes, n_keys=n_old
    )
    mask = np.uint64(m_bits - 1)

    def bloom_positives(b: pa.Table) -> pa.Table:
        from quichash_ray.stages.broadcast import cached_get

        words = cached_get(bitmap_ref)
        raw, _valid = _text_digests(b[text_col].to_pylist())
        h1, h2 = _raw_to_u64_pair(raw)
        hit = _test_bits(words, h1, h2, k, mask)
        pos = raw[hit]
        return pa.table(
            {
                "dig": pa.array(
                    [pos[i].tobytes() for i in range(pos.shape[0])],
                    pa.binary(32),
                )
            }
        )

    positives = new.map_batches(
        bloom_positives, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    ).materialize()
    if positives.count() > positive_broadcast_limit:
        # FP blowup or dup-heavy shard: fall to the always-works join tier
        return _incremental_join(
            new, old_digests, text_col, id_col, digest_col, emit, num_parts
        )

    pos_parts = [
        np.frombuffer(b"".join(t["dig"].to_pylist()), "S32")
        if t.num_rows
        else np.empty(0, "S32")
        for t in ray.get(positives.to_arrow_refs())
    ]
    pos_set = (
        np.unique(np.concatenate(pos_parts))
        if pos_parts
        else np.empty(0, "S32")
    )
    pos_ref = ray.put(pos_set)

    # exact verify: stream the OLD digest table once against the positive
    # set — confirmed = old ∩ positives, bounded by |positives|
    @ray.remote
    def block_confirm(tbl: pa.Table) -> np.ndarray:
        from quichash_ray.stages.broadcast import cached_get

        pos = cached_get(pos_ref)
        col = tbl[digest_col]
        col = col.drop_null() if col.null_count else col
        raw = _hex_to_raw(col)
        keys = (
            raw.reshape(-1).view("S32") if raw.size else np.empty(0, "S32")
        )
        if not len(pos) or not len(keys):
            return np.empty(0, "S32")
        at = np.clip(np.searchsorted(pos, keys), 0, len(pos) - 1)
        return np.unique(keys[pos[at] == keys])

    conf_parts = ray.get(
        [block_confirm.remote(r) for r in old_digests.to_arrow_refs()]
    )
    confirmed = (
        np.unique(np.concatenate(conf_parts))
        if conf_parts
        else np.empty(0, "S32")
    )
    return _classify_with_set(new, confirmed, text_col, id_col, emit)


def _old_raw_sorted(old_digests: Dataset, digest_col: str) -> np.ndarray:
    """old digest table → sorted unique raw digests as numpy 'S32'.
    Per-block hex→raw conversion runs remotely; the driver concatenates
    only 32 B/key arrays (the broadcast-tier contract: |old| is small)."""
    import ray

    @ray.remote
    def block_raw(tbl: pa.Table) -> np.ndarray:
        col = tbl[digest_col]
        col = col.drop_null() if col.null_count else col
        raw = _hex_to_raw(col)
        return raw.reshape(-1).view("S32") if raw.size else np.empty(0, "S32")

    parts = ray.get(
        [block_raw.remote(r) for r in old_digests.to_arrow_refs()]
    )
    if not parts:
        return np.empty(0, "S32")
    return np.unique(np.concatenate(parts))


def _classify_with_set(
    new: Dataset,
    confirmed: np.ndarray,
    text_col: str,
    id_col: str,
    emit: str,
) -> Dataset:
    """Stream new once against a sorted raw-digest membership array."""
    import ray

    set_ref = ray.put(confirmed)

    def classify(b: pa.Table) -> pa.Table:
        from quichash_ray.stages.broadcast import cached_get

        arr = cached_get(set_ref)
        raw, valid = _text_digests(b[text_col].to_pylist())
        keys = raw.reshape(-1).view("S32") if raw.size else np.empty(0, "S32")
        dup_valid = np.zeros(len(keys), bool)
        if len(arr) and len(keys):
            pos = np.clip(np.searchsorted(arr, keys), 0, len(arr) - 1)
            dup_valid = arr[pos] == keys
        dup = np.zeros(b.num_rows, bool)
        dup[np.flatnonzero(valid)] = dup_valid
        if emit == "novel":
            return b.filter(pa.array(~dup))
        return pa.table(
            {
                id_col: b[id_col],
                "status": pa.array(
                    np.where(dup, "dup", "novel").tolist(), pa.string()
                ),
            }
        )

    return new.map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )


def _incremental_join(
    new: Dataset,
    old_digests: Dataset,
    text_col: str,
    id_col: str,
    digest_col: str,
    emit: str,
    num_parts: int | None = None,
) -> Dataset:
    """Giant-old tier: co-partitioned raw-digest join, nothing broadcast.

    Old rows emit (dig, kind=0); new rows emit (dig, kind=1, rid) — for
    ``emit="novel"`` the new side carries its full row so the surviving
    rows come straight out of the exchange (content rides exactly once,
    the unavoidable minimum for a row-preserving filter). Partitioned on
    the digest's leading 8 bytes (cryptographic ⇒ uniform).

    ``num_parts``: pass explicitly for a huge derived ``new`` — the
    default sizes partitions from ``new.count()``, which executes the
    plan once extra (metadata-cheap for parquet-backed inputs, a full
    pass for derived ones; it is NOT materialized — a 100-TB shard must
    never take plasma residency just to be counted)."""
    from quichash_ray.stages.exchange import hash_exchange
    from quichash_ray.stages.partitioning import choose_num_parts

    if num_parts is None:
        num_parts = choose_num_parts(
            new.count() + old_digests.count(), bytes_per_row=96,
            target_bytes=64 << 20,
        )
    P = np.uint64(num_parts)

    def _part_of(raw: np.ndarray) -> np.ndarray:
        if raw.shape[0] == 0:
            return np.empty(0, np.int64)
        lead = np.ascontiguousarray(raw[:, :8]).view(np.uint64).reshape(-1)
        return (lead % P).astype(np.int64)

    schema = new.schema()
    names = list(schema.names)
    types = list(schema.types)

    def old_keys(b: pa.Table) -> pa.Table:
        col = b[digest_col]
        col = col.drop_null() if col.null_count else col
        raw = _hex_to_raw(col)
        dig = pa.array(
            [raw[i].tobytes() for i in range(raw.shape[0])], pa.binary(32)
        )
        cols = {
            "dig": dig,
            "_kind": pa.array(np.zeros(raw.shape[0], np.int8)),
            "part": pa.array(_part_of(raw)),
        }
        if emit == "novel":
            for n, t in zip(names, types):
                cols[n] = pa.nulls(raw.shape[0], t)
        else:
            cols[id_col] = pa.nulls(raw.shape[0], pa.int64())
        return pa.table(cols)

    def new_keys(b: pa.Table) -> pa.Table:
        raw, valid = _text_digests(b[text_col].to_pylist())
        full = np.zeros((b.num_rows, 32), np.uint8)
        full[np.flatnonzero(valid)] = raw
        dig = pa.array(
            [
                full[i].tobytes() if valid[i] else None
                for i in range(b.num_rows)
            ],
            pa.binary(32),
        )
        # null digests (null content) are novel by definition; they still
        # ride the exchange (part 0) so emit="novel" keeps their rows
        part = np.zeros(b.num_rows, np.int64)
        part[np.flatnonzero(valid)] = _part_of(raw)
        cols = {
            "dig": dig,
            "_kind": pa.array(np.ones(b.num_rows, np.int8)),
            "part": pa.array(part),
        }
        if emit == "novel":
            for n in names:
                cols[n] = b[n]
        else:
            cols[id_col] = b[id_col]
        return pa.table(cols)

    left = old_digests.map_batches(
        old_keys, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )
    right = new.map_batches(
        new_keys, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None,
    )

    out_names = names if emit == "novel" else [id_col, "status"]
    out_types = (
        types if emit == "novel" else [pa.int64(), pa.string()]
    )

    def match(g: pa.Table) -> pa.Table:
        empty = pa.schema(list(zip(out_names, out_types))).empty_table()
        if g.num_rows == 0 or "_kind" not in g.column_names:
            return empty
        kind = np.asarray(g["_kind"], np.int8)
        old_t = g.filter(pa.array(kind == 0))
        new_t = g.filter(pa.array(kind == 1))
        if new_t.num_rows == 0:
            return empty
        old_set = (
            np.unique(
                np.frombuffer(
                    b"".join(old_t["dig"].drop_null().to_pylist()), "S32"
                )
            )
            if old_t.num_rows
            else np.empty(0, "S32")
        )
        digs = new_t["dig"].to_pylist()
        valid = np.fromiter((d is not None for d in digs), bool, len(digs))
        keys = np.frombuffer(
            b"".join(d for d in digs if d is not None), "S32"
        )
        dup_valid = np.zeros(len(keys), bool)
        if len(old_set) and len(keys):
            pos = np.clip(
                np.searchsorted(old_set, keys), 0, len(old_set) - 1
            )
            dup_valid = old_set[pos] == keys
        dup = np.zeros(new_t.num_rows, bool)
        dup[np.flatnonzero(valid)] = dup_valid
        if emit == "novel":
            return new_t.filter(pa.array(~dup)).select(names)
        return pa.table(
            {
                id_col: new_t[id_col],
                "status": pa.array(
                    np.where(dup, "dup", "novel").tolist(), pa.string()
                ),
            }
        )

    return hash_exchange([left, right], "part", match, num_parts)
