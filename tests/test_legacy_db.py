"""Legacy DB format round-trips (FIXTURES.md §5; database.rs:417-738)."""

from __future__ import annotations

import lzma

import pytest

from quichash_ray.sources.legacy_db import (
    detect_format,
    parse_hashdeep,
    parse_standard,
    read_legacy_db,
    write_hashdeep_db,
    write_standard_db,
)

STANDARD = (
    "aabb01  sha256  normal  src/main.rs\n"
    "ccdd02  sha256  fast  docs/file with  double  spaces.txt\n"
    "malformed line without separators\n"
    "eeff03  blake3  normal  тест/файл.txt\n"
)

HASHDEEP = (
    "%%%% HASHDEEP-1.0\n"
    "%%%% size,sha256,filename\n"
    "## a comment\n"
    "1000,aabb,file1.txt\n"
    "2000,ccdd,dir/file,with,commas.txt\n"
    "badline\n"
)


class TestDetect:
    def test_standard(self):
        assert detect_format(STANDARD) == "standard"

    def test_hashdeep(self):
        assert detect_format(HASHDEEP) == "hashdeep"


class TestStandard:
    def test_parse(self):
        rows, skipped = parse_standard(STANDARD)
        assert skipped == 1
        assert len(rows) == 3
        # double-space filename survives splitn(4) parsing
        assert rows[1]["path"] == "docs/file with  double  spaces.txt"
        assert rows[1]["fast_mode"] is True
        assert rows[2]["path"] == "тест/файл.txt"

    def test_round_trip(self, tmp_path):
        rows, _ = parse_standard(STANDARD)
        out = str(tmp_path / "db.txt")
        write_standard_db(rows, out)
        rows2, skipped2 = parse_standard(open(out).read())
        assert skipped2 == 0
        assert rows2 == rows

    def test_xz_round_trip(self, tmp_path):
        rows, _ = parse_standard(STANDARD)
        out = str(tmp_path / "db.txt.xz")
        write_standard_db(rows, out, compress=True)
        raw = open(out, "rb").read()
        assert raw[:6] == b"\xfd7zXZ\x00"
        assert parse_standard(lzma.decompress(raw).decode())[0] == rows


class TestHashdeep:
    def test_parse(self):
        rows, skipped = parse_hashdeep(HASHDEEP)
        assert skipped == 1
        assert len(rows) == 2
        assert rows[0]["size"] == 1000
        # database.rs:346-349: the LAST comma field is the filename — a
        # comma-bearing filename is truncated to its final segment (the
        # preceding segments are treated as hash columns); hashdeep CSV
        # cannot round-trip commas in paths
        assert rows[1]["path"] == "commas.txt"
        assert rows[0]["algorithm"] == "sha256"

    def test_algo_inferred_from_hex_len(self):
        text = "100," + "a" * 64 + ",f.txt\n"
        rows, _ = parse_hashdeep(text)
        assert rows[0]["algorithm"] == "sha256"

    def test_round_trip(self, tmp_path):
        rows, _ = parse_hashdeep(HASHDEEP)
        out = str(tmp_path / "hd.csv")
        write_hashdeep_db(rows, out)
        rows2, _ = parse_hashdeep(open(out).read())
        assert [(r["path"], r["hash"], r["size"]) for r in rows2] == [
            (r["path"], r["hash"], r["size"]) for r in rows
        ]


def test_read_legacy_db_dataset(ray_session, tmp_path):
    p = str(tmp_path / "db.txt")
    with open(p, "w") as f:
        f.write(STANDARD)
    ds, skipped = read_legacy_db(p)
    assert skipped == 1
    got = {r["path"]: r for r in ds.take_all()}
    assert len(got) == 3
    assert got["src/main.rs"]["hash"] == "aabb01"


def test_last_write_wins(ray_session, tmp_path):
    p = str(tmp_path / "dup.txt")
    with open(p, "w") as f:
        f.write("h1  sha256  normal  same.txt\nh2  sha256  normal  same.txt\n")
    ds, _ = read_legacy_db(p)
    rows = ds.take_all()
    assert len(rows) == 1
    assert rows[0]["hash"] == "h2"  # database.rs:204


def test_per_algorithm_counts(ray_session, tmp_path):
    """analyze.rs:239-256: per-algorithm / per-mode counts."""
    from quichash_ray.pipelines.dedup import per_algorithm_counts

    p = str(tmp_path / "mixed.txt")
    with open(p, "w") as f:
        f.write(
            "h1  sha256  normal  a.txt\n"
            "h2  sha256  fast  b.txt\n"
            "h3  blake3  normal  c.txt\n"
            "h4  sha256  normal  d.txt\n"
        )
    ds, _ = read_legacy_db(p)
    got = {
        (r["algorithm"], r["fast_mode"]): r["cnt"]
        for r in per_algorithm_counts(ds).take_all()
    }
    assert got == {
        ("sha256", False): 2,
        ("sha256", True): 1,
        ("blake3", False): 1,
    }


def test_hashdeep_multi_hash_columns():
    """Regression (database.rs:333-349): multi-hash rows put the filename
    LAST; the first hash is the primary digest. A comma inside a filename
    shifts the field split (the reference treats the extra segments as
    hash columns) — filename truncates to the final segment."""
    text = (
        "%%%% HASHDEEP-1.0\n"
        "%%%% size,md5,sha256,filename\n"
        "1024,aaaa,bbbb,docs/readme.txt\n"
        "2048,cccc,dddd,dir/with,comma.txt\n"
    )
    rows, skipped = parse_hashdeep(text)
    assert skipped == 0
    assert rows[0]["path"] == "docs/readme.txt"
    assert rows[0]["hash"] == "aaaa"
    assert rows[0]["algorithm"] == "md5"
    assert rows[1]["path"] == "comma.txt"


def test_detect_format_comma_priority():
    """Regression: comma → hashdeep even when the line also contains double
    spaces (database.rs:112-118), and indented headers are detected."""
    assert detect_format("1024,abcd,foo  bar.txt\n") == "hashdeep"
    assert detect_format("  %%%% HASHDEEP-1.0\n") == "hashdeep"
