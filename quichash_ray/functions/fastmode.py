"""Fast-mode sampled digests.

Reproduces the reference's fast-mode sampling strategy
(/root/reference/src/hash.rs:977-1066, constants hash.rs:466-467): for content
of length ``L`` with sample size ``S`` (reference: 100 MiB) and threshold
``3*S``:

- ``L < 3S``  → digest of the full content (fast ≡ normal, hash.rs:1186-1206);
- ``L >= 3S`` → digest of the concatenation of three windows:
    ``[0, S)`` ∪ ``[max(0, L//2 - S//2), +S)`` ∪ ``[max(0, L-S), L)``
  (middle window centered at L/2, saturating subtraction at the edges —
  hash.rs:1013-1019).

Windows may overlap for ``3S <= L < ~4S``; that matches the reference, which
simply seeks and feeds each region to the hasher in order. ``S`` is a
parameter so tests can exercise the sampled path with tiny fixtures
(FIXTURES.md §3 uses S=1024).
"""

from __future__ import annotations

from quichash_ray.functions.hashes import get_digest_fn

FAST_MODE_SAMPLE_SIZE = 100 * 1024 * 1024  # hash.rs:466
FAST_MODE_THRESHOLD = 3 * FAST_MODE_SAMPLE_SIZE  # hash.rs:467


def fast_sample(
    data: bytes | memoryview, sample_size: int = FAST_MODE_SAMPLE_SIZE
) -> bytes | memoryview:
    """The byte string fast mode actually digests (full content when small).

    Accepts a ``memoryview`` (the zero-copy digest path) — only the three
    sampled windows are copied when concatenation is needed."""
    n = len(data)
    if n < 3 * sample_size:
        return data
    first = data[0:sample_size]
    mid_start = max(0, n // 2 - sample_size // 2)
    middle = data[mid_start : mid_start + sample_size]
    last = data[max(0, n - sample_size) : n]
    if isinstance(data, memoryview):
        return bytes(first) + bytes(middle) + bytes(last)
    return first + middle + last


def fast_digest_hex(
    data: bytes | str,
    algorithm: str = "sha256",
    sample_size: int = FAST_MODE_SAMPLE_SIZE,
) -> str:
    """Hex digest under fast-mode sampling semantics."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    return get_digest_fn(algorithm)(fast_sample(data, sample_size)).hex()
