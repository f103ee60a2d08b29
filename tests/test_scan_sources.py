"""Wildcard expansion + ignore filtering + path kernels (S7/S8, M7-M9)."""

from __future__ import annotations

import pytest

from quichash_ray.functions.pathnorm import (
    clean_path,
    normalize_separators,
    relative_to,
)
from quichash_ray.sources.scan import IgnoreFilter, apply_ignore, expand_wildcards


class TestWildcards:
    def test_expand_and_sort(self, tmp_path):
        for name in ("b.parquet", "a.parquet", "c.txt"):
            (tmp_path / name).write_text("x")
        got = expand_wildcards([str(tmp_path / "*.parquet")])
        assert got == sorted(got)
        assert len(got) == 2

    def test_no_match_raises(self, tmp_path):
        # wildcard.rs:23-69: error when a pattern matches nothing
        with pytest.raises(FileNotFoundError):
            expand_wildcards([str(tmp_path / "*.nope")])

    def test_literal_passthrough(self):
        assert expand_wildcards(["/some/literal/path"]) == ["/some/literal/path"]


class TestIgnoreFilter:
    """ignore_handler.rs:85-198 semantics."""

    def test_basename_pattern(self):
        f = IgnoreFilter(["*.log"])
        assert f.is_ignored("a.log")
        assert f.is_ignored("deep/dir/b.log")
        assert not f.is_ignored("a.txt")

    def test_dir_pattern(self):
        f = IgnoreFilter(["build/"])
        assert f.is_ignored("build/out.o")
        assert f.is_ignored("sub/build/out.o")
        assert not f.is_ignored("buildfile")

    def test_negation_last_match_wins(self):
        f = IgnoreFilter(["*.log", "!keep.log"])
        assert f.is_ignored("x.log")
        assert not f.is_ignored("keep.log")

    def test_comments_and_blanks_skipped(self):
        f = IgnoreFilter(["# comment", "", "*.tmp"])
        assert f.is_ignored("a.tmp")

    def test_anchored(self):
        f = IgnoreFilter(["/root_only.txt"])
        assert f.is_ignored("root_only.txt")

    def test_apply_ignore_dataset(self, ray_session):
        import pyarrow as pa
        import ray.data

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "path": pa.array(
                        ["src/a.py", "build/x.o", "keep.log", "y.log"],
                        pa.string(),
                    )
                }
            )
        )
        out = apply_ignore(ds, ["*.log", "build/", "!keep.log"])
        assert sorted(r["path"] for r in out.take_all()) == [
            "keep.log",
            "src/a.py",
        ]


class TestPathKernels:
    """path_utils.rs:10-127 analogs."""

    def test_separators(self):
        assert normalize_separators("a\\b\\c.txt") == "a/b/c.txt"

    def test_clean(self):
        assert clean_path("a/./b/../c") == "a/c"
        assert clean_path("./x") == "x"
        assert clean_path("") == ""

    def test_relative(self):
        assert relative_to("/root/dir/file.txt", "/root/dir") == "file.txt"
        assert relative_to("other/file.txt", "/root") == "other/file.txt"
        assert relative_to("a\\b\\c.txt", "a") == "b/c.txt"
