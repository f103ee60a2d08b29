"""13-gram overlap decontamination: tier equivalence, quote detection,
edge cases."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _mk(ray_session):
    import ray.data

    texts, ids = [], []
    vocab = [f"w{i}" for i in range(400)]
    import random

    rng = random.Random(17)
    for i in range(60):
        ids.append(i)
        texts.append(" ".join(rng.choice(vocab) for _ in range(30)))
    train = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )
    # eval: 15-token quotes from every 5th train doc + one novel doc
    ev_ids, ev_texts = [], []
    for i in range(0, 60, 5):
        ev_ids.append(1000 + i)
        ev_texts.append(" ".join(texts[i].split()[4:19]))
    ev_ids.append(9999)
    ev_texts.append(" ".join(f"novel{j}" for j in range(20)))
    test = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(ev_ids, pa.int64()), "text": pa.array(ev_texts)}
        )
    )
    return train, test


def _result(ds) -> dict[int, int]:
    df = ds.to_pandas()
    return dict(zip(df["doc_id"], df["n_shared"]))


def test_quotes_detected_and_counted(ray_session):
    from quichash_ray.pipelines.decontam import ngram_decontaminate

    train, test = _mk(ray_session)
    got = _result(ngram_decontaminate(train, test, k=13))
    # every quoted doc shares exactly 3 distinct 13-grams (15-token quote)
    assert set(got) == set(range(0, 60, 5))
    assert all(v == 3 for v in got.values())


def test_join_tier_equivalence(ray_session):
    from quichash_ray.pipelines.decontam import (
        _ngram_decontaminate_join,
        ngram_decontaminate,
    )

    train, test = _mk(ray_session)
    bcast = _result(ngram_decontaminate(train, test, k=13))
    join = _result(_ngram_decontaminate_join(train, test, 13, "text", "doc_id"))
    assert bcast == join


def test_short_docs_and_nulls(ray_session):
    import ray.data

    from quichash_ray.pipelines.decontam import ngram_decontaminate

    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["too short", None]),
            }
        )
    )
    test = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10], pa.int64()),
                "text": pa.array([" ".join(f"t{i}" for i in range(20))]),
            }
        )
    )
    out = ngram_decontaminate(train, test, k=13).to_pandas()
    assert len(out) == 0
