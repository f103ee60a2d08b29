"""Session-scoped Ray fixture — init ONCE per pytest session."""

from __future__ import annotations

import os

import pytest

# keep idle Ray workers alive across the session's many small pipelines —
# see the matching note in bench.py (worker respawn pays numpy import +
# first-touch page faults per query; intermittently pathological on the
# bench VM)
os.environ.setdefault("RAY_idle_worker_killing_time_threshold_ms", "600000")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf0001_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def corpus_dir(ray_session, tmp_path_factory):
    """Small deterministic synthetic corpus (2000 rows, seed 42)."""
    from quichash_ray.sources.corpus import write_corpus

    out = str(tmp_path_factory.mktemp("corpus") / "t1")
    return write_corpus(out, n_rows=2000, seed=42)
