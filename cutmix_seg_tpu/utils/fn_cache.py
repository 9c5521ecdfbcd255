"""Small bounded LRU for compiled-function reuse.

Long-lived processes that construct many trainers/meshes must not pin dead
executables; jitted eval/predict builders key their programs here per
(model, mesh, config) identity and evict least-recently-used beyond a small
bound.
"""

from __future__ import annotations

import collections
from typing import Callable


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
