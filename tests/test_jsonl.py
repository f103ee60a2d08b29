"""JSONL corpus interchange: round-trip, schema check, id coercion."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest


def test_jsonl_roundtrip(ray_session, tmp_path):
    import ray.data

    from quichash_ray.sources.jsonl import (
        read_corpus_jsonl,
        write_corpus_jsonl,
    )

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["alpha beta", "gamma", "delta epsilon zeta"]),
            "lang": pa.array(["en", "de", "en"]),
        }
    )
    out = str(tmp_path / "corpus_jsonl")
    write_corpus_jsonl(ray.data.from_arrow(t), out)
    back = read_corpus_jsonl(out).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == [1, 2, 3]
    assert back["text"].tolist() == t["text"].to_pylist()
    assert back["lang"].tolist() == ["en", "de", "en"]


def test_jsonl_missing_column_raises(ray_session, tmp_path):
    from quichash_ray.sources.jsonl import read_corpus_jsonl

    p = tmp_path / "bad.jsonl"
    p.write_text(
        "\n".join(json.dumps({"id": i, "body": "x"}) for i in range(3))
    )
    with pytest.raises(ValueError, match="missing required column"):
        read_corpus_jsonl(str(p))


def test_jsonl_id_coercion_and_pipeline(ray_session, tmp_path):
    """external dumps often carry ids as JSON numbers that arrive as
    double or int32 — the reader must hand downstream ops int64, and the
    result must feed a real pipeline."""
    from quichash_ray.pipelines.dedup import digest_table, duplicate_groups
    from quichash_ray.sources.jsonl import read_corpus_jsonl

    p = tmp_path / "corpus.jsonl"
    rows = [
        {"doc_id": i, "text": f"doc body {i % 4}"} for i in range(12)
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ds = read_corpus_jsonl(str(p))
    assert dict(zip(ds.schema().names, ds.schema().types))["doc_id"] == pa.int64()
    groups = duplicate_groups(
        digest_table(ds, content_col="text", key_cols=("doc_id",)),
        id_col="doc_id",
    ).to_pandas()
    assert len(groups) == 4 and (groups["cnt"] == 3).all()
