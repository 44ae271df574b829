"""Bounded, scope-LRU cache for per-(session, dataset) fit subtrees.

VERDICT r8 item 7: module-global dicts keyed by (applicationId, sf_dir)
held persisted DataFrames (minhash signatures, weighted edge lists, media
fixtures) with no eviction — fine for a test harness, but a long-lived
driver that sweeps many sf_dirs accumulates pinned storage blocks without
bound. ``FitCache`` bounds the number of live SCOPES — an
(applicationId, sf_dir) pair — not entries: one dataset legitimately owns
several subtree entries at once (shingle sets, gram relations, signatures,
codebooks) and they must never evict each other mid-query; what a
long-lived driver must shed is whole datasets it has moved past. When the
scope bound is exceeded, every entry of the least-recently-touched scope is
dropped and its DataFrames unpersisted (best-effort: a stopped session's
handles are dead and its storage died with the JVM).

A ``dict`` subclass on purpose: ``tools/scale_probe.py`` purges any
module-global ``*_CACHE`` dict via plain ``.clear()`` when recycling
sessions, and that must keep working unchanged (clear drops references
without unpersisting — correct there, since the owning JVM is going away).
"""

from __future__ import annotations

# Live (applicationId, sf_dir) scopes kept per cache. 4 covers the standard
# harness sweep (sf0.001 / sf0.01 / sf0.1 / sf1 in one session) without any
# eviction; a wider ad-hoc sweep starts shedding the oldest dataset's blocks.
MAX_SCOPES = 4


class FitCache(dict):
    """dict with scope-LRU eviction. Keys are tuples whose first
    ``scope_len`` elements identify the (session, dataset) scope."""

    def __init__(self, scope_len: int = 2, max_scopes: int = MAX_SCOPES,
                 scope_of=None):
        super().__init__()
        self._scope_len = scope_len
        self._max_scopes = max_scopes
        self._scope_of = scope_of  # custom key -> scope extractor
        self._scope_order: list[tuple] = []  # LRU: most recently used last

    def _scope(self, key: tuple) -> tuple:
        if self._scope_of is not None:
            return tuple(self._scope_of(key))
        return tuple(key[: self._scope_len])

    def touch(self, key: tuple) -> None:
        """Mark key's scope as most-recently-used; evict over-bound scopes."""
        s = self._scope(key)
        if s in self._scope_order:
            self._scope_order.remove(s)
        self._scope_order.append(s)
        while len(self._scope_order) > self._max_scopes:
            old = self._scope_order.pop(0)
            for k in [k for k in self if self._scope(k) == old]:
                v = super().pop(k)
                unpersist = getattr(v, "unpersist", None)
                if callable(unpersist):
                    try:
                        unpersist()
                    except Exception:
                        pass  # owning session already stopped; blocks are gone

    def get_or_build(self, key: tuple, build):
        """Return the cached value for key, building (and retaining) it on
        miss. Touches the scope either way."""
        self.touch(key)
        v = self.get(key)
        if v is None:
            v = build()
            self[key] = v
        return v

    def clear(self) -> None:  # scale_probe purge path: drop refs, no unpersist
        super().clear()
        self._scope_order.clear()
