"""Per-worker-process cache for ``ray.put``-broadcast stage state.

The engine's broadcast pattern: driver puts the small side / model /
filter ONCE (``ray.put``), every task reads it via its ObjectRef.
``ray.get`` of a plasma object is zero-copy for numpy and cheap for
small objects, but deserialization of dict/pandas payloads repeats per
call — this cache makes the fetch (and an optional per-process build
step) once per worker process per ref, so broadcast-state stages can
run as TASK pools that scale to every core instead of actor pools
with a fixed concurrency cap (an actor's only job was caching one
``ray.get``). Bounded: entries are evicted FIFO past a small cap,
which also bounds pinned plasma memory for numpy-backed views.
"""

from __future__ import annotations

from collections import OrderedDict

_CACHE: "OrderedDict[tuple, object]" = OrderedDict()
_CAP = 16


def fetch(ref, build=None, key=()):
    """Return the broadcast object behind ``ref``, cached per worker
    process. ``build`` transforms the raw object once per process, e.g.
    deriving lookup structures a stage would otherwise rebuild per
    batch. The cache key is (ref, build's qualname, ``key``): a
    module-level ``build`` identifies itself via qualname; a
    parameterized build (``functools.partial``, closure) MUST pass its
    parameters as ``key`` (a hashable tuple) so two different builds
    over the same ref never alias one cache slot."""
    ckey = (ref.hex(), getattr(build, "__qualname__", None), key)
    if ckey not in _CACHE:
        import ray

        obj = ray.get(ref)
        _CACHE[ckey] = build(obj) if build is not None else obj
        while len(_CACHE) > _CAP:
            _CACHE.popitem(last=False)
    return _CACHE[ckey]
