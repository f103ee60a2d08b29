"""Suffix substring stage: longest-common-span + cluster stage semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from quichash_ray.config import FuzzyConfig
from quichash_ray.stages.suffix import (
    _token_ids,
    longest_common_span,
    substring_stage,
)


class TestLongestCommonSpan:
    def test_identical(self):
        t = _token_ids("a b c d e f g")
        assert longest_common_span(t, t) == 7

    def test_disjoint(self):
        assert (
            longest_common_span(_token_ids("a b c"), _token_ids("x y z")) == 0
        )

    def test_known_overlap(self):
        a = _token_ids("p q r COMMON1 COMMON2 COMMON3 COMMON4 s t")
        b = _token_ids("x COMMON1 COMMON2 COMMON3 COMMON4 y z w")
        assert longest_common_span(a, b) == 4

    def test_brute_force_oracle(self):
        rng = np.random.Generator(np.random.Philox(key=[7, 0]))
        vocab = [f"w{i}" for i in range(20)]
        for _ in range(20):
            a = [vocab[i] for i in rng.integers(0, 20, size=30)]
            b = [vocab[i] for i in rng.integers(0, 20, size=30)]
            # plant a shared run half the time
            if rng.random() < 0.5:
                run = [vocab[i] for i in rng.integers(0, 20, size=8)]
                pos_a = int(rng.integers(0, 22))
                pos_b = int(rng.integers(0, 22))
                a[pos_a : pos_a + 8] = run
                b[pos_b : pos_b + 8] = run
            ta, tb = _token_ids(" ".join(a)), _token_ids(" ".join(b))
            got = longest_common_span(ta, tb)
            # brute force over all spans
            best = 0
            for i in range(len(ta)):
                for j in range(len(tb)):
                    k = 0
                    while (
                        i + k < len(ta)
                        and j + k < len(tb)
                        and ta[i + k] == tb[j + k]
                    ):
                        k += 1
                    best = max(best, k)
            assert got == best


def test_substring_stage(ray_session):
    import ray.data

    shared = " ".join(f"tok{i}" for i in range(60))
    docs = pa.table(
        {
            "row_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "content": pa.array(
                [
                    "aa bb " + shared + " cc",
                    "dd " + shared + " ee ff",
                    "totally different text with no overlap at all here",
                    shared,  # third member of cluster 1's span family
                    "another lonely document",
                ],
                pa.large_string(),
            ),
        }
    )
    clusters = pa.table(
        {
            "row_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "cluster_id": pa.array([1, 1, 3, 1, 5], pa.int64()),
        }
    )
    spans = substring_stage(
        ray.data.from_arrow(docs),
        ray.data.from_arrow(clusters),
        FuzzyConfig(),
    ).to_pandas()
    got = {
        (r.id_a, r.id_b): r.span_tokens for r in spans.itertuples()
    }
    assert set(got) == {(1, 2), (1, 4), (2, 4)}
    assert all(v == 60 for v in got.values())
