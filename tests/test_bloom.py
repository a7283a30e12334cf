"""D6 — partitioned Bloom URL-seen filter: no false negatives, bounded
fpp, driver merge, and exact unseen-set semantics via the prefilter."""

import numpy as np
from pyspark.sql import functions as F

from retailer_scrapers_spark.operators.bloom import (
    BloomFilter,
    build_bloom,
    filter_unseen,
    probe_bloom,
)


def test_no_false_negatives_and_fpp():
    bf = BloomFilter.for_capacity(10_000, fpp=1e-3)
    rng = np.random.default_rng(42)
    h1 = rng.integers(-(2**62), 2**62, 10_000, dtype=np.int64)
    h2 = rng.integers(-(2**62), 2**62, 10_000, dtype=np.int64)
    bf.add_hashes(h1, h2)
    assert bf.contains_hashes(h1, h2).all()  # membership property
    q1 = rng.integers(-(2**62), 2**62, 50_000, dtype=np.int64)
    q2 = rng.integers(-(2**62), 2**62, 50_000, dtype=np.int64)
    fp_rate = bf.contains_hashes(q1, q2).mean()
    assert fp_rate < 5e-3, fp_rate


def test_serialize_roundtrip_and_merge():
    a = BloomFilter(1 << 12, 5)
    b = BloomFilter(1 << 12, 5)
    a.add_hashes(np.array([1, 2, 3]), np.array([9, 8, 7]))
    b.add_hashes(np.array([100]), np.array([200]))
    rt = BloomFilter.deserialize(a.serialize())
    assert np.array_equal(rt.bits, a.bits) and rt.k == a.k and rt.n_items == 3
    a.merge(b)
    assert a.contains_hashes(np.array([100]), np.array([200]))[0]
    assert a.n_items == 4


def test_build_probe_distributed(spark):
    urls = [(f"https://h{i % 7}.test/p/{i}",) for i in range(2000)]
    df = spark.createDataFrame(urls, "url_canon string").repartition(8)
    bf = build_bloom(df, m_bits=1 << 16, k_hashes=7)
    assert bf.n_items == 2000
    probed = probe_bloom(df, bf)
    assert probed.filter(~F.col("__maybe_seen")).count() == 0  # no false negatives
    fresh = spark.createDataFrame([(f"https://new.test/{i}",) for i in range(2000)], "url_canon string")
    fp = probe_bloom(fresh, bf).filter(F.col("__maybe_seen")).count()
    assert fp < 2000 * 0.02


def test_filter_unseen_exact(spark):
    seen_urls = [(f"https://s.test/{i}",) for i in range(500)]
    seen = spark.createDataFrame(seen_urls, "url_canon string")
    bf = build_bloom(seen, m_bits=1 << 14, k_hashes=5)
    frontier = spark.createDataFrame(
        seen_urls[:100] + [(f"https://f.test/{i}",) for i in range(300)], "url_canon string"
    )
    out = filter_unseen(frontier, bf, seen)
    got = sorted(r.url_canon for r in out.collect())
    assert got == sorted(f"https://f.test/{i}" for i in range(300))  # EXACT despite Bloom fpp


def test_sliced_build_equivalent_and_state_roundtrip(spark):
    """Key-space-sliced build (the O(m)-total scale path) has the same
    membership semantics, and its per-slice checkpoint rows round-trip."""
    import numpy as np

    from retailer_scrapers_spark.operators.bloom import filter_from_state_rows, filter_state_rows

    urls = spark.createDataFrame([(f"https://h{i % 5}.test/{i}",) for i in range(3000)], "url_canon string")
    bf = build_bloom(urls, m_bits=1 << 16, k_hashes=7, n_slices=8)
    assert bf.n_slices == 8 and bf.n_items == 3000
    assert probe_bloom(urls, bf).filter(~F.col("__maybe_seen")).count() == 0  # no FN
    fresh = spark.createDataFrame([(f"https://x.test/{i}",) for i in range(3000)], "url_canon string")
    assert probe_bloom(fresh, bf).filter(F.col("__maybe_seen")).count() < 90
    rt = filter_from_state_rows(filter_state_rows(bf))
    assert np.array_equal(rt.bits, bf.bits) and (rt.m_bits, rt.k, rt.n_slices) == (bf.m_bits, bf.k, bf.n_slices)


def test_filter_unseen_without_bloom(spark):
    seen = spark.createDataFrame([("a",)], "url_canon string")
    frontier = spark.createDataFrame([("a",), ("b",)], "url_canon string")
    assert [r.url_canon for r in filter_unseen(frontier, None, seen).collect()] == ["b"]
    assert filter_unseen(frontier, None, None).count() == 2


# ---------------------------------------------------------------------------
# Slice-routed state transport (VERDICT r4 #1): filter state as a per-slice
# DataFrame — no whole-filter broadcast/collect anywhere in the path.
# ---------------------------------------------------------------------------

def _bench_urls(spark, n=3000, n_hosts=31):
    return spark.range(n).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % n_hosts).cast("string"),
            F.lit(".test/p/"), F.col("id").cast("string"),
        ).alias("url_canon"),
        F.col("id"),
    )


def test_state_path_matches_broadcast_path(spark):
    """The slice-routed probe must be flag-for-flag identical to the
    driver/broadcast probe — same bits, same hashing, per URL."""
    from retailer_scrapers_spark.operators.bloom import build_bloom_state, probe_filter_state

    urls = _bench_urls(spark)
    seen = urls.filter(F.col("id") % 2 == 0).select("url_canon")
    state = build_bloom_state(seen, m_bits=1 << 16, k_hashes=7, n_slices=8)
    bf = build_bloom(seen, m_bits=1 << 16, k_hashes=7, n_slices=8)
    a = {r.url_canon: r["__maybe_seen"] for r in probe_bloom(urls.select("url_canon"), bf).collect()}
    b = {r.url_canon: r["__maybe_seen"] for r in probe_filter_state(urls.select("url_canon"), state, n_slices=8).collect()}
    assert a == b
    assert sum(b.values()) >= 1500  # every seen URL probes positive (no FN)


def test_state_probe_no_whole_filter_broadcast(spark):
    """Filter state ≫ one slice: the probe plan must route by slice
    (FlatMapCoGroupsInArrow) with NO broadcast of the filter and no
    driver collect in the build (build returns a lazy DataFrame)."""
    from retailer_scrapers_spark.operators.bloom import build_bloom_state, probe_filter_state

    urls = _bench_urls(spark, n=5000)
    seen = urls.filter(F.col("id") % 2 == 0).select("url_canon")
    state = build_bloom_state(seen, m_bits=1 << 18, k_hashes=7, n_slices=8)
    rows = state.collect()
    assert len(rows) == 8 and len({r.partition_id for r in rows}) == 8  # state spans all 8 slices
    probed = probe_filter_state(urls.select("url_canon"), state, n_slices=8)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInArrow" in plan, plan
    assert "Broadcast" not in plan, plan


def test_merge_filter_state_matches_driver_merge(spark):
    """Executor-side reduce-by-slice OR must equal the driver OR-merge."""
    from retailer_scrapers_spark.operators.bloom import build_bloom_state, merge_filter_state

    urls = _bench_urls(spark)
    half_a = urls.filter(F.col("id") % 2 == 0).select("url_canon")
    half_b = urls.filter(F.col("id") % 2 == 1).select("url_canon")
    kw = dict(m_bits=1 << 16, k_hashes=7, n_slices=8)
    merged = merge_filter_state(build_bloom_state(half_a, **kw), build_bloom_state(half_b, **kw))
    rows = sorted(merged.collect(), key=lambda r: r.partition_id)
    assert sum(r.n_items for r in rows) == 3000
    driver = build_bloom(half_a, **kw).merge(build_bloom(half_b, **kw))
    words = driver.m_slice // 64
    for r in rows:
        seg = np.frombuffer(bytes(r.filter_bytes), dtype=np.uint64, count=words)
        lo = r.partition_id * words
        assert np.array_equal(seg, driver.bits[lo : lo + words])


def test_filter_unseen_split_state_exact(spark):
    """Exactness contract of the state-path split: (unseen, dup) is the
    true membership partition of the frontier — including when the state
    holds MULTIPLE unmerged delta generations per slice (probe ORs)."""
    from retailer_scrapers_spark.operators.bloom import build_bloom_state, filter_unseen_split_state

    urls = _bench_urls(spark, n=2000)
    seen_a = urls.filter(F.col("id") % 4 == 0).select("url_canon")
    seen_b = urls.filter(F.col("id") % 4 == 1).select("url_canon")
    seen = seen_a.unionByName(seen_b)
    kw = dict(m_bits=1 << 16, k_hashes=7, n_slices=8)
    # two generations, deliberately NOT merged
    state = build_bloom_state(seen_a, **kw).unionByName(build_bloom_state(seen_b, **kw))
    unseen, dup = filter_unseen_split_state(urls.select("url_canon"), state, seen, n_slices=8)
    got_unseen = {r.url_canon for r in unseen.collect()}
    got_dup = {r.url_canon for r in dup.collect()}
    truth_seen = {r.url_canon for r in seen.collect()}
    all_urls = {r.url_canon for r in urls.collect()}
    assert got_dup == truth_seen
    assert got_unseen == all_urls - truth_seen


def test_state_probe_survives_long_typed_partition_id(spark):
    """Regression: a LONG-typed partition_id (schema inference on a
    reloaded state) must not mis-route cogroup keys — mis-routing makes
    slices meet the wrong rows and produces FALSE NEGATIVES, silently
    breaking seen-set exactness."""
    from retailer_scrapers_spark.operators.bloom import build_bloom_state, probe_filter_state

    urls = _bench_urls(spark, n=2000)
    seen = urls.filter(F.col("id") % 2 == 0).select("url_canon")
    state = build_bloom_state(seen, m_bits=1 << 16, k_hashes=7, n_slices=8)
    long_state = spark.createDataFrame(state.collect())  # ints infer as LongType
    assert str(long_state.schema["partition_id"].dataType) == "LongType()"
    fn = (
        probe_filter_state(seen, long_state, n_slices=8)
        .filter(~F.col("__maybe_seen"))
        .count()
    )
    assert fn == 0


def test_exact_verify_has_no_seen_side_exchange(spark):
    """VERDICT r5 #1: the exact-verify backstop must never SHUFFLE the
    seen table. The flipped shape scans seen into a BroadcastHashJoin
    LeftSemi against the broadcast positives keys; the only
    hash-partitioning Exchange anywhere in the plan is the probe's own
    slice routing — none keyed on url_canon."""
    import re

    from retailer_scrapers_spark.operators.bloom import build_bloom_state, filter_unseen_split_state

    urls = _bench_urls(spark, n=2000)
    seen = urls.filter(F.col("id") % 2 == 0).select("url_canon")
    state = build_bloom_state(seen, m_bits=1 << 16, k_hashes=7, n_slices=8)
    unseen, dup = filter_unseen_split_state(urls.select("url_canon"), state, seen, n_slices=8)
    for df in (unseen, dup):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, plan
        assert "BroadcastHashJoin" in plan, plan
        for m in re.finditer(r"Exchange hashpartitioning\(([^,)]*)", plan):
            # probe routing only: the frontier by __slice, the (tiny)
            # per-slice state rows by partition_id — never url_canon
            assert "__slice" in m.group(1) or "partition_id" in m.group(1), plan
    # exactness is untouched by the plan flip
    truth = {r.url_canon for r in seen.collect()}
    assert {r.url_canon for r in dup.collect()} == truth
    assert {r.url_canon for r in unseen.collect()} == {
        r.url_canon for r in urls.select("url_canon").collect()
    } - truth


def test_exact_verify_forced_shuffled_by_negative_guard(spark):
    """A NEGATIVE verify_broadcast_max_rows forces the exact shuffled
    anti/semi pair with no sizing job and no positives broadcast — for
    callers that already know from input metadata that the positives are
    past the broadcast crossover (the scale-adaptive d6 entry at large
    SF). Results must be identical to the flipped shape."""
    from retailer_scrapers_spark.operators.bloom import build_bloom_state, filter_unseen_split_state

    urls = _bench_urls(spark, n=2000)
    seen = urls.filter(F.col("id") % 2 == 0).select("url_canon")
    state = build_bloom_state(seen, m_bits=1 << 16, k_hashes=7, n_slices=8)
    unseen, dup = filter_unseen_split_state(
        urls.select("url_canon"), state, seen, n_slices=8, verify_broadcast_max_rows=-1
    )
    # the verify is the direct anti-join, not the flip: the flipped
    # shape nests a LeftSemi (matched = seen ⋉ positives) inside the
    # unseen plan's broadcast build; the forced pair has no semi at all
    # (Catalyst may still auto-broadcast the tiny test-sized build side,
    # so the node TYPE is not the discriminator — the join shape is)
    plan = unseen._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" not in plan, plan
    truth = {r.url_canon for r in seen.collect()}
    assert {r.url_canon for r in dup.collect()} == truth
    assert {r.url_canon for r in unseen.collect()} == {
        r.url_canon for r in urls.select("url_canon").collect()
    } - truth


def test_probe_rejects_incompatible_state_blobs():
    """ADVICE r5: a pre-state-DataFrame SCK1 checkpoint or a mis-sized
    blob must fail loudly, never be probed as garbage bits (garbage
    probes can yield FALSE NEGATIVES, breaking seen-set exactness)."""
    import pytest

    from retailer_scrapers_spark.operators.bloom import _probe_slice_blob

    h1 = np.array([1, 2], dtype=np.int64)
    h2 = np.array([3, 4], dtype=np.int64)
    with pytest.raises(ValueError, match="incompatible filter state"):
        _probe_slice_blob(b"SCK1" + b"\x00" * 64, 7, 3, h1, h2)
    with pytest.raises(ValueError, match="not word-aligned"):
        _probe_slice_blob(b"\x00" * 13, 7, 3, h1, h2)
    with pytest.raises(ValueError, match="incompatible filter state"):
        # 128 bytes = 1024 bits, but the state row declares 2048
        _probe_slice_blob(b"\x00" * 128, 7, 3, h1, h2, expected_m_slice=2048)
    # a correctly-sized blob still probes fine
    out = _probe_slice_blob(b"\x00" * 128, 7, 3, h1, h2, expected_m_slice=1024)
    assert not out.any()


def test_state_probe_empty_state_unknown_slicing(spark):
    """Library edge: an EMPTY state with n_slices unspecified must probe
    all-False (nothing is in an empty filter), not crash inferring the
    slice count from a row that isn't there."""
    from retailer_scrapers_spark.operators.bloom import STATE_DDL, probe_filter_state

    urls = _bench_urls(spark, n=50)
    empty = spark.createDataFrame([], STATE_DDL)
    probed = probe_filter_state(urls.select("url_canon"), empty).collect()
    assert len(probed) == 50 and not any(r["__maybe_seen"] for r in probed)
