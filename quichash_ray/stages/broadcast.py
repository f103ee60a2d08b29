"""Worker-local cache for broadcast ``ray.get``.

A kernel that calls ``ray.get(ref)`` per BATCH hammers the local raylet
with one object-pin round-trip per batch per worker. Measured on the
32-CPU bench host: a trivial pair-verify stage over 1.4M rows (default
1024-row batches → ~1400 UDF calls) spent 20-90 s in kernel-side churn
(high sys time, low user, cores idle) when every call re-got the same
broadcast object, vs 0.4 s when the deserialized value was cached per
worker process. Broadcast objects are read-only by contract, so the
cache is free; it is keyed by object-ref hex and bounded BOTH by entry
count and by an approximate byte budget — cached values are often
zero-copy numpy views that pin the backing plasma object, so an
unbounded-bytes cache in a long-lived worker (idle reaping is raised to
600 s by bench/conftest) would keep e.g. a 1 GiB bloom bitmap plus
several 64 MB candidate matrices pinned across a whole multi-query
sweep, driving spill/eviction pressure. The most-recently-used entry is
always retained regardless of size (evicting the value the CURRENT
query is reading per batch would re-create the per-batch-get storm);
older entries are evicted LRU once the budget is exceeded.

Use this ONLY for bounded broadcast values (candidate-id arrays,
centroids, query matrices, common-line sets, stored-DB metadata under a
broadcast limit). Do NOT use it for per-partition data refs that
enumerate the corpus (e.g. the a-side block refs of the blocked
self-join) — caching those would accumulate the corpus in every worker.
"""

from __future__ import annotations

import os
from collections import OrderedDict

_CACHE: OrderedDict[str, tuple[object, int]] = OrderedDict()
_MAX_ENTRIES = 32
_MAX_BYTES = int(
    os.environ.get("QUICHASH_BROADCAST_CACHE_BYTES", 256 << 20)
)
_cache_bytes = 0


def _approx_nbytes(val: object) -> int:
    """Recursive nbytes estimate for the payload shapes we broadcast:
    numpy arrays, pyarrow tables/arrays, bytes, and tuples/lists/dicts of
    those. Unknown leaves count 64 B — the pin risk is the big buffers."""
    import numpy as np

    if isinstance(val, np.ndarray):
        return int(val.nbytes)
    if isinstance(val, (bytes, bytearray, memoryview)):
        return len(val)
    nbytes = getattr(val, "nbytes", None)
    if isinstance(nbytes, int):  # pyarrow Table / Array / Buffer
        return nbytes
    if isinstance(val, dict):
        return sum(_approx_nbytes(v) for v in val.values()) + 64 * len(val)
    if isinstance(val, (tuple, list, set, frozenset)):
        return sum(_approx_nbytes(v) for v in val) + 16 * len(val)
    return 64


def _evict_to_budget() -> None:
    global _cache_bytes
    while (
        len(_CACHE) > 1
        and (len(_CACHE) > _MAX_ENTRIES or _cache_bytes > _MAX_BYTES)
    ):
        _, (_, nb) = _CACHE.popitem(last=False)
        _cache_bytes -= nb


def cached_get(ref):
    """``ray.get(ref)`` with a per-worker-process LRU cache (entry- and
    byte-bounded; the newest entry always stays)."""
    global _cache_bytes
    key = ref.hex()
    ent = _CACHE.get(key)
    if ent is not None:
        _CACHE.move_to_end(key)
        return ent[0]
    import ray

    val = ray.get(ref)
    nb = _approx_nbytes(val)
    _CACHE[key] = (val, nb)
    _cache_bytes += nb
    _evict_to_budget()
    return val


def cache_stats() -> dict:
    """Observability for tests: current entry count and byte estimate."""
    return {"entries": len(_CACHE), "bytes": _cache_bytes}
