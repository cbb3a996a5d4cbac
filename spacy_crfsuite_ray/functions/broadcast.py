"""Per-process memoized reads of broadcast (ray.put) objects.

``ray.get`` of a plain Python object deserializes it on every call; batch
UDFs that probe a broadcast dict must not pay that per batch. ``get_broadcast``
caches the deserialized object per worker process, keyed by the ObjectRef.
"""

from __future__ import annotations

_CACHE: dict = {}


def get_broadcast(ref):
    key = ref.hex()
    obj = _CACHE.get(key)
    if obj is None:
        import ray

        obj = ray.get(ref)
        _CACHE[key] = obj
    return obj
