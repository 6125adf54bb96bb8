"""SessionMemo eviction — memo caches must not pin artifacts of stopped
sessions or grow without bound across datasets (r5 hygiene finding)."""

from __future__ import annotations

from cyber_etl_spark.session import SessionMemo, session_token


def test_dead_session_entries_evicted_on_write():
    m = SessionMemo()
    m[("app-old", "/data/a")] = "stale1"
    m[("app-old", "/data/b", "variant")] = "stale2"
    # same token: both live entries coexist
    assert len(m) == 2
    # a write from a NEW session (PySpark allows one live context per
    # process, so a different token == the old session is stopped)
    m[("app-new", "/data/a")] = "fresh"
    assert list(m) == [("app-new", "/data/a")]


def test_size_cap_drops_oldest():
    m = SessionMemo(cap=3)
    for i in range(5):
        m[("app", f"/data/{i}")] = i
    assert len(m) == 3
    assert ("app", "/data/0") not in m and ("app", "/data/1") not in m
    assert m[("app", "/data/4")] == 4


def test_builder_cache_purges_foreign_token(spark, sf_smoke):
    """End to end: seed the real edge cache with a dead-session entry,
    trigger a build, and observe the stale entry gone while the fresh
    one is served from cache."""
    from cyber_etl_spark.graph import builder

    builder._EDGE_CACHE[("dead-app-id", sf_smoke)] = "ghost"
    e1 = builder.co_supply_edges(spark, sf_smoke)
    assert ("dead-app-id", sf_smoke) not in builder._EDGE_CACHE
    tok = session_token(spark)
    assert (tok, sf_smoke) in builder._EDGE_CACHE
    # second call is a pure cache hit (same object)
    assert builder.co_supply_edges(spark, sf_smoke) is e1


def test_overwrite_at_capacity_keeps_other_entries():
    """Overwriting an existing key at capacity must not evict an
    unrelated live entry (review r6 finding)."""
    m = SessionMemo(cap=3)
    m[("app", "a")] = 1
    m[("app", "b")] = 2
    m[("app", "c")] = 3
    m[("app", "b")] = 22  # replacement, no net growth
    assert dict(m) == {("app", "a"): 1, ("app", "b"): 22, ("app", "c"): 3}


def test_non_tuple_key_rejected():
    """Non-tuple keys would make the purge compare k[0] against a
    character (ADVICE r6) — rejected loudly."""
    import pytest

    m = SessionMemo()
    with pytest.raises(TypeError):
        m["app-old"] = 1
    with pytest.raises(TypeError):
        m[()] = 1


def test_update_and_setdefault_route_through_guard():
    """dict.update()/setdefault() are C-level fast paths that would
    bypass __setitem__ — SessionMemo overrides them so every insertion
    path purges dead sessions and respects the cap."""
    m = SessionMemo(cap=2)
    m.update({("app", "a"): 1, ("app", "b"): 2, ("app", "c"): 3})
    assert len(m) == 2
    m.setdefault(("new-app", "x"), 9)
    assert list(m) == [("new-app", "x")]  # purge ran
    assert m.setdefault(("new-app", "x"), 0) == 9  # existing key kept
