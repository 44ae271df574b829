"""Scope-LRU bound on the per-(session, dataset) fit caches (VERDICT r8
item 7): module-global caches of persisted DataFrames must shed whole
datasets a long-lived driver has moved past, unpersisting their blocks on
evict — and the scale_probe purge path (plain .clear()) must keep working.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drive_health_etl_spark.operators.fitcache import FitCache


class FakeDF:
    def __init__(self):
        self.persisted = True

    def unpersist(self):
        self.persisted = False


def test_scope_lru_evicts_oldest_scope_and_unpersists():
    c = FitCache(scope_len=2, max_scopes=2)
    a1, a2, b1, c1 = FakeDF(), FakeDF(), FakeDF(), FakeDF()
    c.get_or_build(("app", "sfA", "x"), lambda: a1)
    c.get_or_build(("app", "sfA", "y"), lambda: a2)
    c.get_or_build(("app", "sfB", "x"), lambda: b1)
    assert a1.persisted and a2.persisted and b1.persisted
    # third scope: sfA (oldest) evicts wholesale, both entries unpersisted
    c.get_or_build(("app", "sfC", "x"), lambda: c1)
    assert not a1.persisted and not a2.persisted
    assert b1.persisted and c1.persisted
    assert ("app", "sfA", "x") not in c and ("app", "sfA", "y") not in c
    assert ("app", "sfB", "x") in c and ("app", "sfC", "x") in c


def test_touch_refreshes_lru_order():
    c = FitCache(scope_len=2, max_scopes=2)
    a, b, d = FakeDF(), FakeDF(), FakeDF()
    c.get_or_build(("app", "sfA", "x"), lambda: a)
    c.get_or_build(("app", "sfB", "x"), lambda: b)
    # re-touch sfA: sfB becomes the LRU scope
    c.get_or_build(("app", "sfA", "x"), lambda: FakeDF())
    c.get_or_build(("app", "sfC", "x"), lambda: d)
    assert a.persisted and not b.persisted and d.persisted


def test_eviction_survives_unpersist_errors():
    class Dead:
        def unpersist(self):
            raise RuntimeError("session stopped")

    c = FitCache(scope_len=2, max_scopes=1)
    c.get_or_build(("app", "sfA", "x"), lambda: Dead())
    fresh = FakeDF()
    c.get_or_build(("app", "sfB", "x"), lambda: fresh)  # must not raise
    assert list(c) == [("app", "sfB", "x")]
    assert fresh.persisted


def test_non_unpersistable_values_are_just_dropped():
    c = FitCache(scope_len=2, max_scopes=1)
    c.get_or_build(("app", "sfA"), lambda: [1.0, 2.0])  # plain fit weights
    c.get_or_build(("app", "sfB"), lambda: [3.0])
    assert ("app", "sfA") not in c


def test_custom_scope_extractor():
    # _MEDIA_CACHE keys are (appId, codec, sf_dir, *params): scope must be
    # (appId, sf_dir), so two codecs of one dataset share a scope
    c = FitCache(max_scopes=1, scope_of=lambda k: (k[0], k[2]))
    png, gif, png2 = FakeDF(), FakeDF(), FakeDF()
    c.get_or_build(("app", "png", "sfA"), lambda: png)
    c.get_or_build(("app", "gif", "sfA"), lambda: gif)
    assert png.persisted and gif.persisted  # same scope: no eviction
    c.get_or_build(("app", "png", "sfB"), lambda: png2)
    assert not png.persisted and not gif.persisted and png2.persisted


def test_clear_drops_without_unpersist_for_session_recycle():
    # scale_probe recycles sessions and purges *_CACHE dicts via .clear();
    # the handles belong to a dead JVM, so clear must NOT call unpersist
    c = FitCache(max_scopes=4)

    class Boom:
        def unpersist(self):
            raise AssertionError("clear must not unpersist")

    c.get_or_build(("app", "sfA"), lambda: Boom())
    c.clear()
    assert len(c) == 0
    # and the LRU order reset: refilling works from scratch
    fresh = FakeDF()
    c.get_or_build(("app", "sfB"), lambda: fresh)
    assert ("app", "sfB") in c


def test_dedup_subtree_cache_sweep_frees_old_blocks(spark, monkeypatch):
    """End-to-end on the real dedup cache: sweeping a second sf_dir past
    the scope bound unpersists the first dataset's persisted subtree."""
    from drive_health_etl_spark.operators import dedup as D

    monkeypatch.setattr(D._SUBTREE_CACHE, "_max_scopes", 1)
    D._SUBTREE_CACHE.clear()
    try:
        df1 = D._cached(spark, "/fake/dirA", "probe", lambda: spark.range(10))
        assert df1.storageLevel.useMemory  # persisted while its scope lives
        df2 = D._cached(spark, "/fake/dirB", "probe", lambda: spark.range(20))
        assert not df1.storageLevel.useMemory  # evicted AND unpersisted
        assert df2.storageLevel.useMemory
        assert len(D._SUBTREE_CACHE) == 1
    finally:
        D._SUBTREE_CACHE.clear()
