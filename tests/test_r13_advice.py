"""Pinning tests for the r13 ADVICE items (ADVICE.md, round 12).

1. ``check_probe_params`` RAISES (not warns) when the build parameters
   are stamped but the ``*_fmt`` layout key is absent — every in-repo
   builder that did that is pre-r11 (v1 stride), so such a table is
   KNOWN to answer a v2 probe with silent false negatives.
2. ``bounded_persist``'s refresh path confirms plan identity with
   ``sameSemantics``: a semanticHash COLLISION between genuinely
   different plans must unpersist the old handle instead of dropping it
   untracked (the permanent-leak class).
3. The between-row hygiene in ``tools/check_oracle.py`` drains the
   registry by POPPING handles, so a ``clearCache()`` failure cannot
   orphan tracked blocks (exercised via the same pop-drain pattern).
"""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import functions as F

from data_integration_est_spark import util as u


def _stamped(spark, meta: dict):
    df = spark.range(3).select(F.col("id").alias("j"))
    return df.withMetadata("j", meta)


def test_probe_params_raise_when_params_stamped_but_fmt_missing(spark):
    expect = {"bloom_n_bits": 64, "bloom_n_hashes": 3, "bloom_fmt": 2}
    # params present + fmt absent = definitively a pre-r11 v1 table
    sk = _stamped(spark, {"bloom_n_bits": 64, "bloom_n_hashes": 3})
    with pytest.raises(ValueError, match="NO layout version"):
        u.check_probe_params(sk, "j", expect, "bloom_probe")


def test_probe_params_warn_only_when_fully_unstamped(spark):
    expect = {"bloom_n_bits": 64, "bloom_n_hashes": 3, "bloom_fmt": 2}
    sk = _stamped(spark, {})
    with pytest.warns(UserWarning, match="UNSTAMPED"):
        u.check_probe_params(sk, "j", expect, "bloom_probe")


def test_probe_params_ok_when_fully_stamped_and_matching(spark):
    expect = {"bloom_n_bits": 64, "bloom_n_hashes": 3, "bloom_fmt": 2}
    sk = _stamped(spark, dict(expect))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        u.check_probe_params(sk, "j", expect, "bloom_probe")


def test_probe_params_mismatch_still_raises(spark):
    expect = {"bloom_n_bits": 64, "bloom_n_hashes": 3, "bloom_fmt": 2}
    sk = _stamped(spark, {"bloom_n_bits": 128, "bloom_n_hashes": 3,
                          "bloom_fmt": 2})
    with pytest.raises(ValueError, match="rebuild the table"):
        u.check_probe_params(sk, "j", expect, "bloom_probe")


def test_bounded_persist_collision_unpersists_old_handle(spark):
    """Force a semanticHash collision between two DIFFERENT plans: the
    old handle must be unpersisted on the refresh path, not silently
    dropped from the registry (which would leak its cache entry)."""
    with u._LIVE_PERSISTS_LOCK:
        saved = list(u._LIVE_PERSISTS)
        u._LIVE_PERSISTS.clear()
    try:
        a = spark.range(10).select((F.col("id") * 2).alias("v"))
        b = spark.range(10).select((F.col("id") * 3).alias("v"))
        # instance attributes shadow the methods: same key, honest
        # sameSemantics (different plans -> False)
        a.semanticHash = lambda: 424242
        b.semanticHash = lambda: 424242
        pa = u.bounded_persist(a)
        assert pa.storageLevel.useMemory
        u.bounded_persist(b)
        # the collision was detected as a different plan and the old
        # handle was unpersisted, not leaked
        assert not pa.storageLevel.useMemory
        with u._LIVE_PERSISTS_LOCK:
            assert len(u._LIVE_PERSISTS) == 1
    finally:
        with u._LIVE_PERSISTS_LOCK:
            while u._LIVE_PERSISTS:
                try:
                    u._LIVE_PERSISTS.pop()[1].unpersist()
                except Exception:  # noqa: BLE001
                    pass
            u._LIVE_PERSISTS.extend(saved)


def test_bounded_persist_same_plan_refresh_keeps_cache(spark):
    """Re-persisting the SAME plan must refresh, not unpersist — the
    r12 fix this collision guard must not regress."""
    with u._LIVE_PERSISTS_LOCK:
        saved = list(u._LIVE_PERSISTS)
        u._LIVE_PERSISTS.clear()
    try:
        a = spark.range(10).select((F.col("id") * 2).alias("v"))
        pa = u.bounded_persist(a)
        pa.count()
        pb = u.bounded_persist(
            spark.range(10).select((F.col("id") * 2).alias("v"))
        )
        assert pa.storageLevel.useMemory
        assert pb.storageLevel.useMemory
        with u._LIVE_PERSISTS_LOCK:
            assert len(u._LIVE_PERSISTS) == 1
    finally:
        with u._LIVE_PERSISTS_LOCK:
            while u._LIVE_PERSISTS:
                try:
                    u._LIVE_PERSISTS.pop()[1].unpersist()
                except Exception:  # noqa: BLE001
                    pass
            u._LIVE_PERSISTS.extend(saved)


def test_registry_pop_drain_leaves_no_tracked_handles(spark):
    """The check_oracle.py hygiene pattern: popping each handle and
    unpersisting it empties the registry even if a later step fails."""
    with u._LIVE_PERSISTS_LOCK:
        saved = list(u._LIVE_PERSISTS)
        u._LIVE_PERSISTS.clear()
    try:
        handles = [
            u.bounded_persist(
                spark.range(5).select((F.col("id") + i).alias("v"))
            )
            for i in range(3)
        ]
        with u._LIVE_PERSISTS_LOCK:
            while u._LIVE_PERSISTS:
                u._LIVE_PERSISTS.pop()[1].unpersist()
        for h in handles:
            assert not h.storageLevel.useMemory
    finally:
        with u._LIVE_PERSISTS_LOCK:
            u._LIVE_PERSISTS.extend(saved)
