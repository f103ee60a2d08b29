"""Path string kernels — normalization / cleaning / relativization.

Mirrors /root/reference/src/path_utils.rs:10-127: separator normalization
(``\\`` → ``/``), component-wise cleaning of ``.``/``..`` without filesystem
access, and relative-path projection. These are plain string transforms
applied to the ``path`` column inside ``map_batches``.
"""

from __future__ import annotations

import posixpath


def normalize_separators(path: str) -> str:
    """Backslashes become forward slashes (path_utils.rs:10-28)."""
    return path.replace("\\", "/")


def clean_path(path: str) -> str:
    """Remove ``.`` and resolve ``..`` lexically (path_utils.rs:88-127)."""
    p = normalize_separators(path)
    if not p:
        return p
    cleaned = posixpath.normpath(p)
    return "" if cleaned == "." else cleaned


def relative_to(path: str, root: str) -> str:
    """Strip a root prefix for clean DB paths (path_utils.rs:43-73)."""
    p = clean_path(path)
    r = clean_path(root).rstrip("/")
    if r and (p == r or p.startswith(r + "/")):
        return p[len(r) :].lstrip("/")
    return p
