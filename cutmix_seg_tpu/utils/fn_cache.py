"""Small bounded LRU for compiled-function reuse.

Long-lived processes that construct many trainers/meshes must not pin dead
executables; jitted eval/predict builders key their programs here per
(model, mesh, config) identity and evict least-recently-used beyond a small
bound.
"""

from __future__ import annotations

import collections
import itertools
import threading
import weakref
from typing import Callable

_ident_lock = threading.Lock()
_ident_gen = itertools.count()
_ident_live: dict = {}  # id(obj) -> (weakref, generation)


def stable_ident(obj) -> int:
    """Monotonic generation id for a live object.

    ``id()`` alone is unsafe as a cache key: once the object is collected a
    NEW object can reuse the same address and the cache would return a jitted
    function closed over the dead one. Here a weakref callback evicts the
    (address -> generation) entry on collection, so an address reuse maps to a
    FRESH generation. Objects that do not support weakrefs fall back to the
    raw id (documented best-effort, same behaviour as before)."""
    key = id(obj)
    with _ident_lock:
        ent = _ident_live.get(key)
        if ent is not None and ent[0]() is obj:
            return ent[1]
        gen = next(_ident_gen)
        try:
            ref = weakref.ref(obj, lambda _r, key=key: _ident_live.pop(key, None))
        except TypeError:
            return key
        _ident_live[key] = (ref, gen)
        return gen


class FnCache:
    def __init__(self, max_size: int = 8):
        self._cache = collections.OrderedDict()
        self._max = max_size

    def get_or_build(self, key, build: Callable):
        f = self._cache.get(key)
        if f is None:
            f = build()
            self._cache[key] = f
        self._cache.move_to_end(key)  # true LRU: hits refresh recency
        while len(self._cache) > self._max:
            self._cache.popitem(last=False)
        return f
