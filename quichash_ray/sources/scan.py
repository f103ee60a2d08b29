"""Scan-time source helpers — wildcard expansion and ignore filtering.

- ``expand_wildcards``: glob ``*?[...]`` patterns over parquet paths/dirs,
  sorted deterministically; error when nothing matches — the behavior of
  /root/reference/src/wildcard.rs:23-69 applied to table sources. Feeds
  ``ray.data.read_parquet([...])`` (multi-directory append is a native union,
  main.rs:280-332 analog).
- ``IgnoreFilter``: gitignore-style path predicate with wildcards, dir
  patterns (``build/``), negation (``!keep.txt``) and last-match-wins —
  /root/reference/src/ignore_handler.rs:27-82 semantics. Compiled once per
  worker (the reference builds its matcher once per scan, ST5) and applied
  as a vectorized-ish batch filter on the ``path`` column.
"""

from __future__ import annotations

import fnmatch
import glob as _glob
import re

import pyarrow as pa
from ray.data import Dataset


def expand_wildcards(patterns: list[str]) -> list[str]:
    """glob each pattern; union, sorted; raise if a pattern matches nothing."""
    out: set[str] = set()
    for pat in patterns:
        if any(c in pat for c in "*?["):
            matches = _glob.glob(pat)
            if not matches:
                raise FileNotFoundError(f"no files match pattern: {pat}")
            out.update(matches)
        else:
            out.add(pat)
    return sorted(out)


class IgnoreFilter:
    """gitignore-semantics matcher over relative posix paths.

    Rules are evaluated in order; the LAST matching rule decides (negations
    re-include). A pattern without ``/`` matches the basename at any depth;
    a trailing ``/`` matches a directory prefix; leading ``/`` anchors to
    the root.
    """

    def __init__(self, patterns: list[str]):
        # rule = (negate, compiled, dir_only, basename)
        self.rules: list[tuple[bool, re.Pattern, bool, bool]] = []
        for raw in patterns:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            negate = line.startswith("!")
            if negate:
                line = line[1:]
            dir_only = line.endswith("/")
            line = line.rstrip("/")
            anchored = line.startswith("/")
            line = line.lstrip("/")
            # fnmatch's '*' crosses '/'; that laxity matches the reference's
            # matcher behavior on its test corpus
            basename = not anchored and "/" not in line
            self.rules.append(
                (negate, re.compile(fnmatch.translate(line)), dir_only, basename)
            )

    def is_ignored(self, path: str) -> bool:
        path = path.lstrip("/")
        segments = path.split("/")
        ignored = False
        for negate, pat, dir_only, basename in self.rules:
            if dir_only:
                hit = any(
                    pat.match(
                        segments[i - 1] if basename else "/".join(segments[:i])
                    )
                    for i in range(1, len(segments))
                )
            elif basename:
                hit = bool(pat.match(segments[-1]))
            else:
                hit = bool(pat.match(path))
            if hit:
                ignored = not negate
        return ignored


_FILTER_CACHE: dict[tuple, IgnoreFilter] = {}


def apply_ignore(
    ds: Dataset, patterns: list[str], path_col: str = "path"
) -> Dataset:
    """Filter out ignored rows; the matcher compiles once per worker process
    (module cache) — the build-once/apply-per-record pattern."""
    key = tuple(patterns)

    def kernel(b: pa.Table) -> pa.Table:
        f = _FILTER_CACHE.get(key)
        if f is None:
            f = IgnoreFilter(list(key))
            _FILTER_CACHE[key] = f
        mask = [not f.is_ignored(p) for p in b[path_col].to_pylist()]
        return b.filter(pa.array(mask))

    return ds.map_batches(kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
