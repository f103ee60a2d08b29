"""Verify / compare — the reference's DB ⋈ filesystem and DB ⋈ DB operations
as distributed joins.

- ``verify_classify``: full outer join of the *stored* digest table and the
  *current* digest table on ``path``, classifying each row as
  match / mismatch / missing / new — the classification matrix of
  /root/reference/src/verify.rs:141-180 (parallel impl verify.rs:264-361).
  The reference holds the DB in a driver HashMap and par-iters it; here both
  sides are Datasets and the join is a hash-partitioned shuffle.

- ``compare_classify``: the same outer join between two digest tables,
  yielding unchanged / changed / removed / added
  (/root/reference/src/compare.rs:434-475).

- ``moved_pairs``: inner join of the removed and added splits on ``digest``,
  pairing 1:1 per digest with path-sorted determinism
  (/root/reference/src/compare.rs:477-528) — a ``groupby(digest).map_groups``
  zip rather than a driver-side hash map.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _outer_join(
    left: Dataset,
    right: Dataset,
    on: str,
    left_suffix: str,
    right_suffix: str,
    num_partitions: int | None,
) -> Dataset:
    if num_partitions is None:
        # scale-aware: derive the partition count from the larger side
        # (~100B/row digest metadata); inputs are materialized first so the
        # count doesn't re-execute the plan under the join
        from quichash_ray.stages.partitioning import choose_num_parts

        left = left.materialize()
        right = right.materialize()
        num_partitions = choose_num_parts(
            max(left.count(), right.count()),
            bytes_per_row=100,
            target_bytes=64 << 20,
        )
    return left.join(
        right,
        join_type="full_outer",
        num_partitions=num_partitions,
        on=(on,),
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )


def verify_classify(
    stored: Dataset,
    current: Dataset,
    on: str = "path",
    digest_col: str = "digest",
    num_partitions: int | None = None,
) -> Dataset:
    """→ (path, status, expected, actual); status ∈ match|mismatch|missing|new.

    ``stored``/``current`` must each carry ``(on, digest_col)``. Mirrors the
    verify classification (verify.rs:302-348): both sides present and digests
    equal → match; present but different → mismatch (expected=stored digest,
    actual=current digest); stored only → missing; current only → new.
    """
    joined = _outer_join(
        stored.select_columns([on, digest_col]),
        current.select_columns([on, digest_col]),
        on,
        "_stored",
        "_cur",
        num_partitions,
    )

    def classify(b: pa.Table) -> pa.Table:
        exp = b[digest_col + "_stored"]
        act = b[digest_col + "_cur"]
        has_exp = pc.is_valid(exp)
        has_act = pc.is_valid(act)
        status = pc.if_else(
            pc.and_(has_exp, has_act),
            pc.if_else(
                pc.equal(exp, act),
                pa.scalar("match"),
                pa.scalar("mismatch"),
            ),
            pc.if_else(has_exp, pa.scalar("missing"), pa.scalar("new")),
        )
        return pa.table(
            {
                on: b[on],
                "status": status,
                "expected": exp,
                "actual": act,
            }
        )

    return joined.map_batches(classify, batch_format="pyarrow", batch_size=None)


def _verify_mixed_broadcast(
    stored: Dataset,
    current: Dataset,
    path_col: str,
    content_col: str,
    digest_col: str,
    algo_col: str,
    fast_col: str,
    fast_sample_size: int | None,
) -> Dataset:
    """Small-stored-DB tier of :func:`verify_mixed` — stored metadata
    broadcasts once (``ray.put`` of sorted numpy arrays); the current side
    streams through two pruned passes (classify; path-only seen-set) and
    content never enters a shuffle. ``stored`` arrives materialized and
    projected to (path, digest, algorithm, fast_mode)."""
    import numpy as np
    import ray

    from quichash_ray.functions.fastmode import (
        FAST_MODE_SAMPLE_SIZE,
        fast_sample,
    )
    from quichash_ray.functions.hashes import canonical_name, get_digest_fn
    from quichash_ray.state.metrics import get_metrics_actor

    metrics = get_metrics_actor()
    S = fast_sample_size or FAST_MODE_SAMPLE_SIZE

    # skip zero-row blocks — Ray can emit them with an EMPTY schema that
    # breaks concat_tables
    live = [
        t
        for t in (ray.get(r) for r in stored.to_arrow_refs())
        if t.num_rows
    ]
    tbl = (
        pa.concat_tables(live)
        if live
        else pa.table(
            {
                path_col: pa.array([], pa.string()),
                digest_col: pa.array([], pa.string()),
                algo_col: pa.array([], pa.string()),
                fast_col: pa.array([], pa.bool_()),
            }
        )
    )
    sp = np.asarray(tbl[path_col].to_pylist(), dtype=object)
    order = np.argsort(sp)
    sp = sp[order]
    sd = np.asarray(tbl[digest_col].to_pylist(), dtype=object)[order]
    sa = np.asarray(tbl[algo_col].to_pylist(), dtype=object)[order]
    sf = np.asarray(tbl[fast_col].to_pylist(), dtype=object)[order]
    ref = ray.put((sp, sd, sa, sf))

    def _positions(paths_list, sp_arr):
        cur = np.asarray(paths_list, dtype=object)
        if len(sp_arr) == 0:
            return np.full(len(cur), -1, np.int64)
        pos = np.clip(np.searchsorted(sp_arr, cur), 0, len(sp_arr) - 1)
        hit = sp_arr[pos] == cur
        return np.where(hit, pos, -1).astype(np.int64)

    def classify(b: pa.Table) -> pa.Table:
        from quichash_ray.stages.broadcast import cached_get

        spb, sdb, sab, sfb = cached_get(ref)
        paths = b[path_col].to_pylist()
        texts = b[content_col].to_pylist()
        pos = _positions(paths, spb)
        status: list[str] = []
        expected: list[str | None] = []
        actual: list[str | None] = []
        fns: dict[str, Any] = {}
        n_skipped = 0
        for t, p in zip(texts, pos):
            if p < 0:
                status.append("new")
                expected.append(None)
                actual.append(None)
                continue
            e, a, f = sdb[p], sab[p], sfb[p]
            expected.append(e)
            if t is None:
                status.append("missing")
                actual.append(None)
                continue
            if e is None or a is None:
                status.append("skipped")
                actual.append(None)
                n_skipped += 1
                continue
            name = canonical_name(a)
            fn = fns.get(name)
            if fn is None:
                fn = fns[name] = get_digest_fn(name)
            data = t.encode("utf-8")
            if f:
                data = fast_sample(data, S)
            d = fn(data).hex()
            actual.append(d)
            status.append("match" if d == e else "mismatch")
        if n_skipped:
            metrics.add.remote("verify_mixed_skipped_null", n_skipped)
        return pa.table(
            {
                path_col: b[path_col],
                "status": pa.array(status, pa.string()),
                "expected": pa.array(expected, pa.string()),
                "actual": pa.array(actual, pa.string()),
            }
        )

    classified = current.select_columns([path_col, content_col]).map_batches(
        classify, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    # missing = stored entries no current row touched. The seen-set pass is
    # path-only (column-pruned — no content decode); per-block matched
    # indices are deduplicated remotely and the driver merges arrays
    # bounded by |stored|, never the corpus.
    def seen_idx(b: pa.Table) -> pa.Table:
        from quichash_ray.stages.broadcast import cached_get

        spb, _, _, _ = cached_get(ref)
        pos = _positions(b[path_col].to_pylist(), spb)
        return pa.table(
            {"sidx": pa.array(np.unique(pos[pos >= 0]), pa.int64())}
        )

    seen = (
        current.select_columns([path_col])
        .map_batches(seen_idx, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .materialize()
    )
    seen_chunks = [np.empty(0, np.int64)]
    for r in seen.to_arrow_refs():
        t = ray.get(r)
        # empty blocks skip the UDF and surface with the pre-map schema
        if t.num_rows and "sidx" in t.column_names:
            seen_chunks.append(np.asarray(t["sidx"], np.int64))
    seen_arr = np.unique(np.concatenate(seen_chunks))
    unseen = np.setdiff1d(np.arange(len(sp)), seen_arr)
    missing_tbl = pa.table(
        {
            path_col: pa.array(sp[unseen].tolist(), pa.string()),
            "status": pa.array(["missing"] * len(unseen), pa.string()),
            "expected": pa.array(sd[unseen].tolist(), pa.string()),
            "actual": pa.nulls(len(unseen), pa.string()),
        }
    )
    import ray.data

    return classified.union(ray.data.from_arrow(missing_tbl))


def verify_mixed(
    stored: Dataset,
    current: Dataset,
    path_col: str = "path",
    content_col: str = "text",
    digest_col: str = "digest",
    algo_col: str = "algorithm",
    fast_col: str = "fast_mode",
    fast_sample_size: int | None = None,
    num_partitions: int | None = None,
    broadcast_limit: int = 1_000_000,
) -> Dataset:
    """Per-entry mixed algorithm/mode verify (verify.rs:302-307): each
    stored entry is re-hashed with ITS OWN ``algorithm`` and fast/normal
    ``fast_mode`` — a stored table mixing md5/sha256 and fast-mode rows
    verifies correctly, where :func:`verify_classify` assumes both sides
    were digested uniformly.

    ``stored``: (path, digest, algorithm, fast_mode). ``current``:
    (path, content). → (path, status, expected, actual); status ∈
    match|mismatch|missing|new|skipped. ``actual`` is the re-digest under
    the stored entry's own algorithm+mode (null for missing/new/skipped).
    A stored row whose digest or algorithm is null cannot be verified — it
    is SKIPPED with a counted status (``verify_mixed_skipped_null`` on the
    metrics actor), per the engine's skip-and-count discipline, rather than
    misclassified as ``new`` or crashing in ``canonical_name``.

    When the stored DB has at most ``broadcast_limit`` rows (the common
    case — a DB is orders of magnitude smaller than the content it
    verifies), the stored metadata broadcasts once as sorted numpy arrays
    and the CONTENT NEVER RIDES A SHUFFLE: one streaming pass classifies
    current rows, a second column-pruned path-only pass finds which stored
    entries were seen, and the (missing) remainder — bounded by the stored
    size — is emitted directly. Above the limit the full-outer join path
    runs; the two are equivalence-tested.
    """
    stored = stored.select_columns(
        [path_col, digest_col, algo_col, fast_col]
    ).materialize()
    if stored.count() <= broadcast_limit:
        return _verify_mixed_broadcast(
            stored, current, path_col, content_col, digest_col, algo_col,
            fast_col, fast_sample_size,
        )
    from quichash_ray.functions.fastmode import (
        FAST_MODE_SAMPLE_SIZE,
        fast_sample,
    )
    from quichash_ray.functions.hashes import canonical_name, get_digest_fn
    from quichash_ray.state.metrics import get_metrics_actor

    # driver-owned handle captured by the kernel closure — an actor created
    # inside a worker UDF would die with that task
    metrics = get_metrics_actor()

    S = fast_sample_size or FAST_MODE_SAMPLE_SIZE

    cur_side = current.select_columns([path_col, content_col])
    if num_partitions is None:
        from quichash_ray.stages.partitioning import choose_num_parts

        cur_side = cur_side.materialize()
        # content rides this join — size partitions to the fat side
        num_partitions = choose_num_parts(
            cur_side.count(), bytes_per_row=2048, target_bytes=64 << 20
        )
    # presence marker: a stored row with null digest/algorithm must still
    # read as "stored side present" after the outer join (its nullable
    # payload columns can't carry that signal)
    def mark_stored(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_stp", pa.array([1] * b.num_rows, pa.int8())
        )

    joined = cur_side.join(
        stored.select_columns(
            [path_col, digest_col, algo_col, fast_col]
        ).map_batches(mark_stored, batch_format="pyarrow", batch_size=None),
        join_type="full_outer",
        num_partitions=num_partitions,
        on=(path_col,),
        left_suffix="_cur",
        right_suffix="_st",
    )

    def kernel(b: pa.Table) -> pa.Table:
        texts = b[content_col].to_pylist()
        exps = b[digest_col].to_pylist()
        algos = b[algo_col].to_pylist()
        fasts = b[fast_col].to_pylist()
        stps = b["_stp"].to_pylist()
        fns: dict[str, Any] = {}
        actual: list[str | None] = []
        status: list[str] = []
        n_skipped = 0
        for t, e, a, f, sp in zip(texts, exps, algos, fasts, stps):
            if sp is None:
                actual.append(None)
                status.append("new")
                continue
            if t is None:
                actual.append(None)
                status.append("missing")
                continue
            if e is None or a is None:
                actual.append(None)
                status.append("skipped")
                n_skipped += 1
                continue
            name = canonical_name(a)
            fn = fns.get(name)
            if fn is None:
                fn = fns[name] = get_digest_fn(name)
            data = t.encode("utf-8")
            if f:
                data = fast_sample(data, S)
            d = fn(data).hex()
            actual.append(d)
            status.append("match" if d == e else "mismatch")
        if n_skipped:
            metrics.add.remote("verify_mixed_skipped_null", n_skipped)
        return pa.table(
            {
                path_col: b[path_col],
                "status": pa.array(status, pa.string()),
                "expected": b[digest_col],
                "actual": pa.array(actual, pa.string()),
            }
        )

    return joined.map_batches(kernel, batch_format="pyarrow", batch_size=None)


def verify_report(classified: Dataset) -> dict:
    """Aggregate counts — the VerifyReport analog (verify.rs:19-34)."""
    from ray.data.aggregate import Count

    counts = classified.groupby("status").aggregate(Count(alias_name="cnt"))
    out = {"match": 0, "mismatch": 0, "missing": 0, "new": 0, "skipped": 0}
    for row in counts.take_all():
        out[row["status"]] = row["cnt"]
    return out


def compare_classify(
    db1: Dataset,
    db2: Dataset,
    on: str = "path",
    digest_col: str = "digest",
    num_partitions: int | None = None,
) -> Dataset:
    """→ (path, status, digest1, digest2); status ∈ unchanged|changed|removed|added.

    compare.rs:434-475 semantics. Count invariants (compare.rs:985-996):
    unchanged+changed+removed == |db1|; unchanged+changed+added == |db2|.
    """
    joined = _outer_join(
        db1.select_columns([on, digest_col]),
        db2.select_columns([on, digest_col]),
        on,
        "_1",
        "_2",
        num_partitions,
    )

    def classify(b: pa.Table) -> pa.Table:
        d1 = b[digest_col + "_1"]
        d2 = b[digest_col + "_2"]
        has1 = pc.is_valid(d1)
        has2 = pc.is_valid(d2)
        status = pc.if_else(
            pc.and_(has1, has2),
            pc.if_else(
                pc.equal(d1, d2), pa.scalar("unchanged"), pa.scalar("changed")
            ),
            pc.if_else(has1, pa.scalar("removed"), pa.scalar("added")),
        )
        return pa.table(
            {on: b[on], "status": status, "digest1": d1, "digest2": d2}
        )

    return joined.map_batches(classify, batch_format="pyarrow", batch_size=None)


def moved_pairs(classified: Dataset) -> Dataset:
    """Moved-file detection (compare.rs:477-528): among removed×added rows
    sharing a digest, pair 1:1 in path-sorted order. → (digest, old_path,
    new_path). Groups are per-digest and tiny, so ``map_groups`` is safe;
    pathological mega-digests are capped by pairing min(len) members.
    """
    rm_add = classified.filter(
        expr="status == 'removed' or status == 'added'"
    )

    def to_sides(b: pa.Table) -> pa.Table:
        digest = pc.if_else(
            pc.equal(b["status"], pa.scalar("removed")),
            b["digest1"],
            b["digest2"],
        )
        return pa.table(
            {"digest": digest, "path": b["path"], "status": b["status"]}
        )

    sides = rm_add.map_batches(to_sides, batch_format="pyarrow", batch_size=None)

    def pair(group: pd.DataFrame) -> pd.DataFrame:
        removed = sorted(group.loc[group["status"] == "removed", "path"])
        added = sorted(group.loc[group["status"] == "added", "path"])
        n = min(len(removed), len(added))
        if n == 0:
            return pd.DataFrame(
                {"digest": [], "old_path": [], "new_path": []}
            ).astype({"digest": str, "old_path": str, "new_path": str})
        return pd.DataFrame(
            {
                "digest": group["digest"].iloc[0],
                "old_path": removed[:n],
                "new_path": added[:n],
            }
        )

    return sides.groupby("digest").map_groups(pair, batch_format="pandas")


def compare_report(classified: Dataset, moved: Dataset | None = None) -> dict:
    """CompareReport counts (compare.rs:43-57); moved pairs are subtracted
    from removed/added per compare.rs:521-522."""
    from ray.data.aggregate import Count

    counts = {"unchanged": 0, "changed": 0, "removed": 0, "added": 0}
    for row in (
        classified.groupby("status")
        .aggregate(Count(alias_name="cnt"))
        .take_all()
    ):
        counts[row["status"]] = row["cnt"]
    n_moved = moved.count() if moved is not None else 0
    counts["moved"] = n_moved
    counts["removed"] -= n_moved
    counts["added"] -= n_moved
    return counts
