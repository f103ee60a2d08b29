"""Verify / compare classification matrices (FIXTURES.md §6)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from quichash_ray.pipelines.dbops import (
    compare_classify,
    compare_report,
    moved_pairs,
    verify_classify,
    verify_report,
)


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "path": pa.array([r[0] for r in rows], pa.string()),
                "digest": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_verify_matrix(ray_session):
    """1 match, 1 mismatch, 1 missing, 1 new (verify.rs:583-616)."""
    stored = _ds([("a", "h1"), ("b", "h2"), ("c", "h3")])
    current = _ds([("a", "h1"), ("b", "hX"), ("d", "h4")])
    classified = verify_classify(stored, current, num_partitions=2)
    rows = {r["path"]: r for r in classified.take_all()}
    assert rows["a"]["status"] == "match"
    assert rows["b"]["status"] == "mismatch"
    assert rows["b"]["expected"] == "h2" and rows["b"]["actual"] == "hX"
    assert rows["c"]["status"] == "missing"
    assert rows["d"]["status"] == "new"
    assert verify_report(classified) == {
        "match": 1,
        "mismatch": 1,
        "missing": 1,
        "new": 1,
        "skipped": 0,
    }


def test_compare_matrix_and_invariants(ray_session):
    """compare.rs:802-847 scenario shape + count invariants (:985-996)."""
    db1 = _ds(
        [("u", "h1"), ("c", "h2"), ("r1", "h3"), ("r2", "h4"), ("r3", "h5")]
    )
    db2 = _ds(
        [("u", "h1"), ("c", "hX"), ("a1", "h6"), ("a2", "h7"),
         ("a3", "h8"), ("a4", "h9")]
    )
    classified = compare_classify(db1, db2, num_partitions=2)
    rep = compare_report(classified)
    assert rep == {
        "unchanged": 1, "changed": 1, "removed": 3, "added": 4, "moved": 0,
    }
    assert rep["unchanged"] + rep["changed"] + rep["removed"] == 5
    assert rep["unchanged"] + rep["changed"] + rep["added"] == 6


def test_moved_detection(ray_session):
    """Same digest removed+added ⇒ moved, subtracted out (compare.rs:505-522)."""
    db1 = _ds([("keep", "h1"), ("old/loc.txt", "hMOVE"), ("gone", "h9")])
    db2 = _ds([("keep", "h1"), ("new/loc.txt", "hMOVE"), ("fresh", "h8")])
    classified = compare_classify(db1, db2, num_partitions=2)
    moved = moved_pairs(classified)
    pairs = moved.take_all()
    assert len(pairs) == 1
    assert pairs[0]["old_path"] == "old/loc.txt"
    assert pairs[0]["new_path"] == "new/loc.txt"
    rep = compare_report(classified, moved)
    assert rep == {
        "unchanged": 1, "changed": 0, "removed": 1, "added": 1, "moved": 1,
    }


def test_moved_one_to_one_zip_determinism(ray_session):
    """Two dups moved: zip pairs path-sorted 1:1 (compare.rs:524-528)."""
    db1 = _ds([("a1", "D"), ("a2", "D")])
    db2 = _ds([("b1", "D"), ("b2", "D"), ("b3", "D")])
    classified = compare_classify(db1, db2, num_partitions=2)
    pairs = sorted(
        (r["old_path"], r["new_path"]) for r in moved_pairs(classified).take_all()
    )
    assert pairs == [("a1", "b1"), ("a2", "b2")]
    rep = compare_report(classified, moved_pairs(classified))
    assert rep["moved"] == 2 and rep["removed"] == 0 and rep["added"] == 1
