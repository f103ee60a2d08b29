"""Sequence-packing plan: prefix-sum correctness across many blocks,
stream contiguity invariants, skip discipline, unique-id guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _mk(ray_session, n=1000, blocks=16, shuffle=True):
    import ray.data

    rng = np.random.default_rng(9)
    ids = np.arange(n, dtype=np.int64)
    if shuffle:
        rng.shuffle(ids)
    texts = [
        " ".join(f"t{j}" for j in range(int(rng.integers(0, 12))))
        for _ in range(n)
    ]
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    return ray.data.from_arrow(t).repartition(blocks), dict(
        zip(ids.tolist(), (len(s.split()) for s in texts))
    )


def test_prefix_sum_and_windows(ray_session):
    from quichash_ray.pipelines.packing import pack_sequences

    ds, truth = _mk(ray_session)
    out = (
        pack_sequences(ds, ctx_len=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # only docs with >= 1 token appear
    expect_ids = sorted(i for i, n in truth.items() if n >= 1)
    assert out["doc_id"].tolist() == expect_ids
    # stream contiguity: offsets are the exclusive cumsum in id order
    run = 0
    for _, row in out.iterrows():
        assert row["start_tok"] == run
        assert row["n_tokens"] == truth[row["doc_id"]]
        assert row["first_seq"] == row["start_tok"] // 7
        assert row["last_seq"] == (row["start_tok"] + row["n_tokens"] - 1) // 7
        assert row["n_seqs"] == row["last_seq"] - row["first_seq"] + 1
        run += row["n_tokens"]


def test_empty_and_null_docs_skipped(ray_session):
    import ray.data

    from quichash_ray.pipelines.packing import pack_sequences

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b", None, "", "c"]),
        }
    )
    out = pack_sequences(ray.data.from_arrow(t), ctx_len=2).to_pandas()
    assert sorted(out["doc_id"]) == [1, 4]
    assert out.set_index("doc_id").loc[4, "start_tok"] == 2


def test_all_empty_input(ray_session):
    import ray.data

    from quichash_ray.pipelines.packing import pack_sequences

    t = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(["", None])}
    )
    out = pack_sequences(ray.data.from_arrow(t))
    assert out.count() == 0
    assert "start_tok" in out.schema().names


def test_duplicate_ids_rejected():
    from quichash_ray.pipelines.packing import _assert_disjoint_ranges

    _assert_disjoint_ranges([(0, 5, 10), (6, 9, 4)])  # disjoint: ok
    with pytest.raises(ValueError, match="unique ids"):
        _assert_disjoint_ranges([(0, 5, 10), (5, 9, 4)])
