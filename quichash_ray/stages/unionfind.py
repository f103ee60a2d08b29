"""Connected components over an edge Dataset — cluster assignment.

Two execution paths behind one API (SURVEY §7.1 milestone 6):

- ``hash-min`` (distributed, default at scale): iterated label propagation —
  every node repeatedly adopts the minimum label in its neighborhood.
  Each round is one shuffle (groupby node → min incoming label); convergence
  is detected by counting changed labels (an aggregate, no driver
  materialization of labels). Deterministic: labels are node ids, min is
  total order. Rounds ≈ cluster diameter, which for dup clusters (stars
  around a representative) is 2-3; ``max_rounds`` bounds the worst case.

- ``driver`` (exact union-find): for edge sets that fit on the driver —
  the correctness oracle for tests and the fast path at bench scale.

Both return (node, cluster_id) with cluster_id = min node id of the
component (the deterministic min-id tie-break, SURVEY §7.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Min


def numpy_components(ea: np.ndarray, eb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized min-label propagation with pointer doubling over edge
    arrays → (nodes, cluster_ids). O(E · log diameter), no Python loop over
    edges — the driver-side fast path for millions of edges."""
    if len(ea) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    nodes, inv = np.unique(np.concatenate([ea, eb]), return_inverse=True)
    ia, ib = inv[: len(ea)], inv[len(ea) :]
    lbl = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = lbl
        m = np.minimum(lbl[ia], lbl[ib])
        lbl = lbl.copy()
        np.minimum.at(lbl, ia, m)
        np.minimum.at(lbl, ib, m)
        lbl = np.minimum(lbl, lbl[lbl])
        lbl = lbl[lbl]
        if np.array_equal(lbl, old):
            break
    # nodes are sorted, so the min label index maps to the min node id
    return nodes, nodes[lbl]


def driver_union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Classic path-compressed union-find; cluster id = min member id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    seen: set[int] = set()
    for u, v in edges:
        seen.add(u)
        seen.add(v)
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min id keeps the representative deterministic
            lo, hi = (ru, rv) if ru < rv else (rv, ru)
            parent[hi] = lo
    return {x: find(x) for x in seen}


def _labels_from_dict(mapping: dict[int, int]) -> Dataset:
    import ray.data

    nodes = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
    labels = np.fromiter(mapping.values(), dtype=np.int64, count=len(mapping))
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, pa.int64()),
                "cluster_id": pa.array(labels, pa.int64()),
            }
        )
    )


def connected_components(
    edges: Dataset,
    method: str = "auto",
    driver_limit: int = 5_000_000,
    max_rounds: int = 20,
) -> Dataset:
    """edges(id_a, id_b) → (node, cluster_id); only nodes with ≥1 edge appear.

    ``auto`` uses exact driver union-find below ``driver_limit`` edges and
    the distributed hash-min iteration above it.
    """
    edges = edges.materialize()  # consumed multiple times below
    if method == "auto":
        method = "driver" if edges.count() <= driver_limit else "hashmin"
    if method == "driver":
        import ray.data

        chunks_a, chunks_b = [], []
        for b in edges.iter_batches(batch_format="pyarrow", batch_size=None):
            chunks_a.append(np.asarray(b["id_a"], dtype=np.int64))
            chunks_b.append(np.asarray(b["id_b"], dtype=np.int64))
        ea = np.concatenate(chunks_a) if chunks_a else np.empty(0, np.int64)
        eb = np.concatenate(chunks_b) if chunks_b else np.empty(0, np.int64)
        nodes, labels = numpy_components(ea, eb)
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array(nodes, pa.int64()),
                    "cluster_id": pa.array(labels, pa.int64()),
                }
            )
        )
    return _hash_min(edges, max_rounds)


def _hash_min(edges: Dataset, max_rounds: int) -> Dataset:
    """Distributed min-label propagation.

    labels ⟵ groupby(node) min over {node} ∪ {label(neighbor)}; repeat until
    no label changes. Each round: map labels over edge endpoints (broadcast
    join via the edge list itself — labels ride along as (node,label) rows
    unioned with neighbor-relayed labels), then a min-groupby shuffle.
    """

    def seed(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"], dtype=np.int64)
        bb = np.asarray(b["id_b"], dtype=np.int64)
        node = np.concatenate([a, bb])
        lbl = np.concatenate([np.minimum(a, bb), np.minimum(a, bb)])
        return pa.table(
            {
                "node": pa.array(node, pa.int64()),
                "lbl": pa.array(lbl, pa.int64()),
            }
        )

    labels = (
        edges.map_batches(seed, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
        .groupby("node")
        .aggregate(Min("lbl", alias_name="cluster_id"))
        .materialize()
    )

    from quichash_ray.stages.lookup import attach_lookup

    for _ in range(max_rounds):
        # relay: each edge forwards min(label(u), label(v)) to both sides,
        # PLUS each node forwards its label to its own label's node
        # (pointer-doubling — collapses chains in O(log diameter) rounds).
        lab = labels.map_batches(
            lambda b: b.rename_columns(["node", "lbl"]), batch_format="pyarrow", batch_size=None
        )
        annotated = attach_lookup(
            attach_lookup(edges, lab, "id_a", "lbl", "lbl_a",
                          key_col_in_mapping="node"),
            lab, "id_b", "lbl", "lbl_b", key_col_in_mapping="node",
        )

        def relay(b: pa.Table) -> pa.Table:
            la = np.asarray(b["lbl_a"], dtype=np.int64)
            lb = np.asarray(b["lbl_b"], dtype=np.int64)
            m = np.minimum(la, lb)
            node = np.concatenate(
                [np.asarray(b["id_a"], np.int64), np.asarray(b["id_b"], np.int64)]
            )
            lbl = np.concatenate([m, m])
            return pa.table(
                {
                    "node": pa.array(node, pa.int64()),
                    "lbl": pa.array(lbl, pa.int64()),
                }
            )

        relayed = annotated.map_batches(
            relay, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        # pointer doubling: node -> label(label(node))
        doubled = attach_lookup(
            labels.map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"],
                        "via": b["cluster_id"],
                    }
                ),
                batch_format="pyarrow", batch_size=None,
            ),
            lab,
            "via",
            "lbl",
            "lbl2",
            key_col_in_mapping="node",
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "lbl": pa.compute.coalesce(b["lbl2"], b["via"]),
                }
            ),
            batch_format="pyarrow", batch_size=None,
        )
        new_labels = (
            relayed.union(doubled)
            .groupby("node")
            .aggregate(Min("lbl", alias_name="cluster_id"))
            .materialize()
        )
        # convergence: any label decreased this round?
        changed = attach_lookup(
            new_labels,
            labels.map_batches(
                lambda b: b.rename_columns(["node", "old"]),
                batch_format="pyarrow", batch_size=None,
            ),
            "node",
            "old",
            "old",
        ).filter(expr="cluster_id < old").count()
        labels = new_labels
        if changed == 0:
            break
    return labels
