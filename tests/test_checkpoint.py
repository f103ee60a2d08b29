"""Checkpoint/resume: resumed run ≡ fresh run (BASELINE.md protocol)."""

from __future__ import annotations

import json
import os

import pytest

from quichash_ray.state.checkpoint import (
    LINEAGE,
    CheckpointedPipeline,
    checkpointed_fuzzy_dedup,
)


@pytest.fixture(scope="module")
def small_corpus(ray_session, corpus_dir):
    return f"{corpus_dir}/corpus"


def _clusters_of(ds):
    df = ds.to_pandas()
    return dict(zip(df["row_id"], df["cluster_id"]))


def test_fresh_run_and_lineage(small_corpus, tmp_path):
    wd = str(tmp_path / "cp1")
    out = checkpointed_fuzzy_dedup(small_corpus, wd)
    got = _clusters_of(out)
    assert len(got) == 2000
    cp = CheckpointedPipeline(wd)
    stages = {m["stage"] for m in cp.report()}
    assert stages == {"membership", "signatures", "verified_edges", "clusters"}
    for m in cp.report():
        assert m["rows"] > 0
        assert m["elapsed_sec"] >= 0
        assert m["n_files"] >= 1
        assert m["rows_per_sec"] is None or m["rows_per_sec"] > 0


def test_resume_skips_completed_and_matches(small_corpus, tmp_path, ray_session):
    import time

    wd = str(tmp_path / "cp2")
    first = _clusters_of(checkpointed_fuzzy_dedup(small_corpus, wd))
    t0 = time.time()
    second = _clusters_of(checkpointed_fuzzy_dedup(small_corpus, wd))
    resume_time = time.time() - t0
    assert first == second
    assert resume_time < 10  # pure replay from parquet

    # simulate mid-job failure: drop the last two stages, resume
    cp = CheckpointedPipeline(wd)
    cp.invalidate("clusters")
    cp.invalidate("verified_edges")
    third = _clusters_of(checkpointed_fuzzy_dedup(small_corpus, wd))
    assert third == first


def test_killed_tmp_dirs_cleared(tmp_path):
    wd = str(tmp_path / "cp3")
    os.makedirs(os.path.join(wd, ".tmp-broken-123"))
    CheckpointedPipeline(wd)
    assert not os.path.exists(os.path.join(wd, ".tmp-broken-123"))


def test_equals_unchunked_pipeline(small_corpus, tmp_path, ray_session):
    """Checkpointed output ≡ the direct fuzzy_dedup output."""
    import ray.data

    from quichash_ray.pipelines.fuzzy import fuzzy_dedup

    wd = str(tmp_path / "cp4")
    cp_out = _clusters_of(checkpointed_fuzzy_dedup(small_corpus, wd))
    direct = _clusters_of(
        fuzzy_dedup(ray.data.read_parquet(small_corpus))
    )
    assert cp_out == direct
