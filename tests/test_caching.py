"""Cache-lifetime helper: finalizer-driven release plus the explicit
release_caches() handle (ADVICE r3)."""

import gc


def _persisted_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_finalizer_releases_on_drop(spark):
    from retailer_scrapers_spark.operators.caching import unpersist_when_collected

    before = _persisted_count(spark)
    cached = spark.range(100).persist()
    cached.count()
    out = unpersist_when_collected(cached.selectExpr("id * 2 AS x"), cached)
    assert out.count() == 100
    del out
    gc.collect()
    assert _persisted_count(spark) == before


def test_explicit_release_is_idempotent(spark):
    from retailer_scrapers_spark.operators.caching import unpersist_when_collected

    before = _persisted_count(spark)
    cached = spark.range(50).persist()
    cached.count()
    out = unpersist_when_collected(cached.selectExpr("id + 1 AS x"), cached)
    out.release_caches()
    out.release_caches()  # finalize objects are idempotent
    assert _persisted_count(spark) == before
    # correctness unaffected after release: lineage recomputes
    assert out.count() == 50
