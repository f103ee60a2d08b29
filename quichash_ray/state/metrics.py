"""Pipeline metrics counters — the no-silent-caps mechanism.

Stages that bound work for skew safety (LSH ``bucket_cap`` dropping over-full
buckets, n-gram ``gram_cap`` dropping hot grams) MUST surface what they
dropped: a silently-capped run reads as "covered everything" when it didn't.
Workers report drops to a tiny named zero-CPU actor (fire-and-forget remote
calls — no hot-path synchronization); drivers read the totals after a run
via :func:`read_metrics` and record them in lineage sidecars / bench output.
"""

from __future__ import annotations

_ACTOR_NAME = "quichash_metrics"
# explicit namespace: a detached actor in the session's anonymous
# namespace makes the raylet print a stdout warning (which would pollute
# bench.py's one-JSON-line contract) and could not be re-found anyway
_NAMESPACE = "quichash"


def _actor_cls():
    import ray

    @ray.remote(num_cpus=0)
    class MetricsActor:
        def __init__(self) -> None:
            self._counts: dict[str, int] = {}

        def add(self, key: str, n: int = 1) -> None:
            self._counts[key] = self._counts.get(key, 0) + int(n)

        def get_all(self) -> dict[str, int]:
            return dict(self._counts)

        def reset(self) -> dict[str, int]:
            out, self._counts = self._counts, {}
            return out

    return MetricsActor


def get_metrics_actor():
    """Get-or-create the named counter actor (per Ray session).

    Detached lifetime: a plain named actor is garbage-collected when its
    creator's handle goes out of scope — counts fired late in a pipeline
    would land on a dead actor once the creating pipeline's objects are
    GC'd. Detached pins it to the Ray session (``ray.shutdown`` reaps it).
    """
    cls = _actor_cls()
    return cls.options(
        name=_ACTOR_NAME,
        namespace=_NAMESPACE,
        get_if_exists=True,
        lifetime="detached",
    ).remote()


def read_metrics() -> dict[str, int]:
    import ray

    try:
        actor = ray.get_actor(_ACTOR_NAME, namespace=_NAMESPACE)
    except ValueError:
        return {}
    return ray.get(actor.get_all.remote())


def reset_metrics() -> dict[str, int]:
    import ray

    try:
        actor = ray.get_actor(_ACTOR_NAME, namespace=_NAMESPACE)
    except ValueError:
        return {}
    return ray.get(actor.reset.remote())
