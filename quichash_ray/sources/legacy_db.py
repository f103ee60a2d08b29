"""Legacy quichash database ingestion — standard / hashdeep / .xz formats.

Byte-level conformance with the reference's persisted formats so existing
databases can be ingested into (and emitted from) the Ray engine:

1. **Standard text DB** — ``"<hash>  <algorithm>  <fast|normal>  <filepath>"``
   two-space delimited; parsed with ``splitn(4)`` semantics so filenames may
   contain double spaces (/root/reference/src/database.rs:230-257, test
   database.rs:697-709). Written at database.rs:133-142.
2. **Hashdeep CSV** — ``%%%% HASHDEEP-1.0`` header, ``%%%% size,<alg>,
   filename`` column line, ``##`` comments, rows ``size,hash,filename``
   (database.rs:146-171, parse 263-401); algorithm inferred from hex length
   when no header names it (database.rs:404-414).
3. **Format auto-detection** — scan the first 10 lines: ``%`` prefix or a
   comma → hashdeep, a double space → standard (database.rs:97-130).
4. **xz transparency** — any DB file may be LZMA/xz compressed; transparent
   decode on read (database.rs:81-94), level-6 compress on write
   (database.rs:45-78).

Malformed lines are skipped with a warning count, never a failure
(skip-and-count semantics, database.rs:529-596). Last write wins on
duplicate paths (database.rs:204).
"""

from __future__ import annotations

import lzma
import os

import pyarrow as pa

from quichash_ray.functions.hashes import infer_algorithm_from_hex


def _read_text(path: str) -> str:
    with open(path, "rb") as f:
        raw = f.read()
    if path.endswith(".xz") or raw[:6] == b"\xfd7zXZ\x00":
        raw = lzma.decompress(raw)
    return raw.decode("utf-8", errors="replace")


def detect_format(text: str) -> str:
    """'hashdeep' | 'standard' — first-10-lines heuristic (database.rs:97-130)."""
    for raw in text.splitlines()[:10]:
        line = raw.strip()
        if not line:
            continue
        if line.startswith("%"):
            return "hashdeep"
        if "," in line:
            # comma → hashdeep unconditionally (database.rs:112-118); a
            # double-space standard line never contains commas in its first
            # three fields, and the reference gives commas priority
            return "hashdeep"
        if "  " in line:
            return "standard"
    return "standard"


def parse_standard(text: str) -> tuple[list[dict], int]:
    """→ (rows, skipped): rows of {hash, algorithm, fast_mode, path}."""
    rows: list[dict] = []
    skipped = 0
    for line in text.splitlines():
        if not line.strip():
            continue
        # splitn(4, "  "): only the first three separators split; the path
        # keeps any further double spaces intact. Each field is trimmed and
        # empty hash/algorithm/path rejected (database.rs:230-257 parse_line
        # trims and validates non-empty).
        parts = line.split("  ", 3)
        if len(parts) != 4:
            skipped += 1
            continue
        digest = parts[0].strip()
        algo = parts[1].strip()
        mode = parts[2].strip()
        path = parts[3].strip()
        if mode not in ("fast", "normal") or not digest or not algo or not path:
            skipped += 1
            continue
        rows.append(
            {
                "hash": digest,
                "algorithm": algo.lower(),
                "fast_mode": mode == "fast",
                "path": path,
            }
        )
    return rows, skipped


def parse_hashdeep(text: str) -> tuple[list[dict], int]:
    """→ (rows, skipped): rows of {hash, algorithm, fast_mode, path, size}."""
    rows: list[dict] = []
    skipped = 0
    algos: list[str] = []
    for line in text.splitlines():
        if not line.strip():
            continue
        if line.startswith("%%%%"):
            body = line[4:].strip()
            if body.startswith("size,"):
                algos = [
                    a.strip()
                    for a in body.split(",")[1:]
                    if a.strip() and a.strip() != "filename"
                ]
            continue
        if line.startswith("#"):
            continue
        parts = line.split(",")
        if len(parts) < 3:
            skipped += 1
            continue
        # database.rs:334-401 parse_hashdeep_line: the LAST field is the
        # filename, the middle fields are hashes. Header algorithm names
        # apply only when their count matches the hash count; otherwise
        # each hash's algorithm is inferred from its hex length. The entry
        # stored is the first non-empty hash (reference keeps
        # entries.first()). The size field is unused by the reference's
        # parser — a non-numeric size does NOT skip the row.
        path = parts[-1].strip()
        if not path:
            skipped += 1
            continue
        hashes = [h.strip() for h in parts[1:-1]]
        nonempty = [(i, h) for i, h in enumerate(hashes) if h]
        if not nonempty:
            skipped += 1
            continue
        idx, digest = nonempty[0]
        if algos and len(algos) == len(hashes):
            algo = algos[idx]
        else:
            algo = infer_algorithm_from_hex(digest) or "unknown"
        try:
            size = int(parts[0].strip())
        except ValueError:
            size = None
        rows.append(
            {
                "hash": digest,
                "algorithm": algo.lower(),
                "fast_mode": False,
                "path": path,
                "size": size,
            }
        )
    return rows, skipped


def read_legacy_db(path: str):
    """Legacy DB file → ``ray.data.Dataset`` of
    (path, hash, algorithm, fast_mode[, size]); last write wins on duplicate
    paths. Returns ``(dataset, skipped_line_count)``."""
    import ray.data

    text = _read_text(path)
    fmt = detect_format(text)
    rows, skipped = (
        parse_hashdeep(text) if fmt == "hashdeep" else parse_standard(text)
    )
    # last-write-wins on duplicate path keys (database.rs:204)
    by_path: dict[str, dict] = {}
    for r in rows:
        by_path[r["path"]] = r
    rows = list(by_path.values())
    cols: dict[str, pa.Array] = {
        "path": pa.array([r["path"] for r in rows], pa.string()),
        "hash": pa.array([r["hash"] for r in rows], pa.string()),
        "algorithm": pa.array([r["algorithm"] for r in rows], pa.string()),
        "fast_mode": pa.array([r["fast_mode"] for r in rows], pa.bool_()),
    }
    if any("size" in r for r in rows):
        cols["size"] = pa.array(
            [r.get("size") for r in rows], pa.int64()
        )
    return ray.data.from_arrow(pa.table(cols)), skipped


def write_standard_db(
    rows: list[dict], path: str, compress: bool = False
) -> None:
    """Emit the reference's standard text format (digest-parity artifacts).

    ``rows``: dicts with hash, algorithm, fast_mode, path — written as
    ``"<hash>  <algorithm>  <fast|normal>  <filepath>"`` (database.rs:133-142);
    xz level 6 when ``compress`` (database.rs:45-78).
    """
    lines = [
        "{}  {}  {}  {}".format(
            r["hash"],
            r["algorithm"],
            "fast" if r.get("fast_mode") else "normal",
            r["path"],
        )
        for r in rows
    ]
    payload = ("\n".join(lines) + "\n").encode("utf-8")
    if compress or path.endswith(".xz"):
        payload = lzma.compress(payload, preset=6)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)


def write_hashdeep_db(
    rows: list[dict], path: str, algorithm: str = "sha256",
    compress: bool = False,
) -> None:
    """Emit the hashdeep CSV format (database.rs:146-171); xz level 6 when
    ``compress`` or the path ends in .xz — the reference compresses any DB
    format (database.rs:45-78)."""
    lines = [
        "%%%% HASHDEEP-1.0",
        f"%%%% size,{algorithm},filename",
        "## Generated by quichash_ray",
    ]
    for r in rows:
        lines.append(f"{r.get('size', 0)},{r['hash']},{r['path']}")
    payload = ("\n".join(lines) + "\n").encode("utf-8")
    if compress or path.endswith(".xz"):
        payload = lzma.compress(payload, preset=6)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
