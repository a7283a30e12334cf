"""Extra benchmarks + profiling for the optimization rounds (guide §1).

NOT part of the driver contract — bench.py is the frozen measurement
harness. This file exists so optimization claims are backed by committed
numbers: per-query isolation (noop sink), cold/warm split, driver-side
DataFrame-construction time vs execution time, GC deltas, and
``explain("formatted")`` dumps into plans/r06/.

Usage:
    python bench_extra.py profile            # per-query cold/warm + GC
    python bench_extra.py explains [suffix]  # dump plans/r06/<q>_<suffix>.txt
    python bench_extra.py frontier           # frontier pipeline stage split
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def _gc_ms(spark) -> float:
    """Total driver-JVM GC milliseconds (all collectors)."""
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return float(sum(b.getCollectionTime() for b in beans))


def _heap_mb(spark) -> float:
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    return (rt.totalMemory() - rt.freeMemory()) / 1e6


def profile() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from retailer_scrapers_spark import get_spark

    spark = get_spark("bench-extra-profile", cores=CPUS)
    qs = entrymod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    out = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        gc0, hp0 = _gc_ms(spark), _heap_mb(spark)
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        gc1 = _gc_ms(spark)
        # warm pass: rebuild the plan fresh (same as bench would on a
        # second invocation) and execute again
        df2 = qs[name](spark, SF_DIR)
        t3 = time.time()
        df2.write.format("noop").mode("overwrite").save()
        t4 = time.time()
        gc2, hp1 = _gc_ms(spark), _heap_mb(spark)
        out[name] = {
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
            "warm_build_s": round(t3 - t2, 3),
            "warm_exec_s": round(t4 - t3, 3),
            "gc_cold_ms": round(gc1 - gc0, 1),
            "gc_warm_ms": round(gc2 - gc1, 1),
            "heap_mb": round(hp1 - hp0, 1),
        }
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps(out))
    spark.stop()


def explains(suffix: str = "before") -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from retailer_scrapers_spark import get_spark

    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("bench-extra-explains", cores=CPUS)
    qs = entrymod.queries()
    for name in HEADLINE:
        if name not in qs:
            continue
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:  # pragma: no cover - diagnostic tool
            plan = f"EXPLAIN FAILED: {e}"
        with open(os.path.join(PLANS_DIR, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)", flush=True)
    spark.stop()


def big_filter() -> None:
    """VERDICT r5 #8: demonstrate the slice-routed probe at a filter
    size that genuinely CANNOT broadcast. Builds the per-slice Bloom
    state at ~4 GiB of bits (vs Spark's practical broadcast budget and
    the driver-collect path both being out of the question), then runs
    the exact slice-routed dedup over an 8M-URL frontier."""
    import math

    from pyspark.sql import functions as F

    from retailer_scrapers_spark import get_spark
    from retailer_scrapers_spark.functions.urls import canonicalize_urls
    from retailer_scrapers_spark.operators.bloom import (
        build_bloom_state,
        filter_unseen_split_state,
    )
    from retailer_scrapers_spark.operators.frontier import topk_per_host

    n = int(os.environ.get("SPARK_GRAFT_BIGFILTER_N", "8000000"))
    m_bits = 1 << 35  # 4 GiB of filter bits — no broadcast path exists
    n_slices = int(os.environ.get("SPARK_GRAFT_BIGFILTER_SLICES", "256"))
    n_seen = n // 2
    overlap = n // 100  # steady-state regime: ~1% of the frontier is dup
    spark = get_spark("bench-extra-bigfilter", cores=CPUS)
    n_hosts = max(n // 2048, 16)

    def urls(lo: int, hi: int):
        return spark.range(lo, hi).select(
            F.concat(
                F.lit("https://Host"), (F.col("id") % n_hosts).cast("string"),
                F.lit(".test/p/"), F.col("id").cast("string"),
                F.lit("?utm_source=bench&b=2&a=1#frag"),
            ).alias("url"),
            F.col("id"),
        )

    # frontier ids [0, n); seen ids [n-overlap, n-overlap+n_seen) — every
    # frontier row probes the full 4 GiB state, the exact verify sees the
    # realistic small positives slice (overlap + fpp)
    seen = canonicalize_urls(urls(n - overlap, n - overlap + n_seen), "url").select("url_canon").persist()
    seen.count()
    frontier_df = (
        canonicalize_urls(urls(0, n), "url")
        .select("url_canon", "host", F.col("id").alias("seq"), F.lit(1.0).alias("priority"))
        .persist()
    )
    frontier_df.count()
    t0 = time.time()
    state = build_bloom_state(seen, m_bits=m_bits, k_hashes=10, n_slices=n_slices).persist()
    state_rows = state.count()
    state_bytes = state.select(F.sum(F.length("filter_bytes"))).collect()[0][0]
    t_build = time.time() - t0
    t1 = time.time()
    unseen, _dup = filter_unseen_split_state(frontier_df, state, seen, n_slices=n_slices)
    n_out = topk_per_host(unseen, per_host_budget=1 << 30).count()
    t_dedup = time.time() - t1
    assert n_out == n - overlap, n_out
    print(json.dumps({
        "n_urls": n,
        "n_seen": n_seen,
        "frontier_dup_rate": overlap / n,
        "filter_gib": round(state_bytes / 2**30, 2),
        "state_rows": state_rows,
        "n_slices": n_slices,
        "state_build_sec": round(t_build, 3),
        "sliced_dedup_topk_sec": round(t_dedup, 3),
        "urls_per_sec": round(n / (t_build + t_dedup), 1),
    }))
    spark.stop()


def frontier() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import BENCH_N, frontier_throughput
    from retailer_scrapers_spark import get_spark

    spark = get_spark("bench-extra-frontier", cores=CPUS)
    res = frontier_throughput(spark, BENCH_N)
    print(json.dumps(res))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "profile"
    if cmd == "profile":
        profile()
    elif cmd == "explains":
        explains(sys.argv[2] if len(sys.argv) > 2 else "before")
    elif cmd == "frontier":
        frontier()
    elif cmd == "big-filter":
        big_filter()
    else:
        raise SystemExit(f"unknown command: {cmd}")
