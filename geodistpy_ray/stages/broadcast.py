"""Per-worker cache for broadcast object-store references.

``ray.put`` once on the driver + ``ray.get`` in every task is the right
broadcast shape, but a ``ray.get`` that deserializes a *structured* object
(dicts of many small arrays) pays unpickling on every call — measured as a
hard concurrency ceiling when hundreds of tasks each re-fetch a polygon
index. Worker processes persist across tasks, so caching the materialized
value per (worker, ref) makes the fetch amortize to once per worker —
exactly the cost model of a real cluster-wide broadcast.
"""

from __future__ import annotations

import ray

_CACHE: dict[str, object] = {}
# a long-lived session (the oracle gate runs 160+ queries, several of which
# ray.put a fresh index each call) must not grow worker RSS without bound —
# evict insertion-oldest past the cap (dicts preserve insertion order; a
# re-fetch after eviction just pays one extra ray.get)
_CACHE_MAX = 32


def get_broadcast(ref):
    """ray.get(ref), cached (size-capped) for this worker process."""
    key = ref.hex()
    if key not in _CACHE:
        while len(_CACHE) >= _CACHE_MAX:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
