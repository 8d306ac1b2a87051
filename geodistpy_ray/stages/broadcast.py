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


def get_broadcast(ref):
    """ray.get(ref), cached for the lifetime of this worker process."""
    key = ref.hex()
    if key not in _CACHE:
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
