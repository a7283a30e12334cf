"""Politeness / robots / visit-window operators (SURVEY.md R1, R2, R3).

The reference sleeps in threads (``time.sleep(5)``
scrape_shoprite.py:257; ``max(timeout, 10)`` scrape_pnp.py:46,150-152)
and exits outside 04:00–08:45 UTC (scrape_pnp.py:53-63). The engine
replaces wall-clock sleeps with a *simulated scheduling clock*: each
epoch has a budget of logical seconds and every selected fetch gets a
deterministic ``scheduled_offset_ms`` honoring the per-host crawl
delay. Tests are fast (no real sleeping) and the schedule is part of
the operator's contract, so golden traces can pin it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCHED_COLS = "scheduled_offset_ms long, wait_ms long, within_budget boolean"


def robots_filter(
    frontier: DataFrame,
    robots: DataFrame,
    url_col: str = "url_canon",
    host_col: str = "host",
) -> tuple[DataFrame, DataFrame]:
    """R3 — split frontier into (allowed, denied) by robots disallow
    prefixes. ``robots.disallow`` holds path(+query) prefixes; a URL is
    denied when its path starts with any of them. The robots table is
    tiny → broadcast join; unknown hosts are allowed."""
    joined = (
        frontier.join(F.broadcast(robots.select(host_col, "disallow", "crawl_delay_s")), host_col, "left")
        # staged so the lambda probes a codegen local, not a per-element
        # re-run of the regex (one eval per row, not per disallow prefix)
        .withColumn("__pathq", F.regexp_replace(F.col(url_col), r"^[a-z][a-z0-9+.\-]*://[^/]+", ""))
        .withColumn(
            "__denied",
            F.when(F.col("disallow").isNull(), F.lit(False)).otherwise(
                F.exists(F.col("disallow"), lambda d: F.col("__pathq").startswith(d))
            ),
        )
    )
    allowed = joined.filter(~F.col("__denied")).drop("__denied", "disallow", "__pathq")
    denied = joined.filter(F.col("__denied")).drop("__denied", "disallow", "__pathq")
    return allowed, denied


def in_visit_window(now_utc_seconds_of_day: int, start_hhmm: F.Column, end_hhmm: F.Column) -> F.Column:
    """R2 — predicate: is the epoch's logical clock inside [start, end]?
    ``start``/``end`` are "HH:MM" strings from the robots table."""
    def to_secs(c: F.Column) -> F.Column:
        return (
            F.split(c, ":").getItem(0).cast("int") * 3600 + F.split(c, ":").getItem(1).cast("int") * 60
        )

    now = F.lit(int(now_utc_seconds_of_day))
    return now.between(to_secs(start_hhmm), to_secs(end_hhmm))


def visit_window_filter(
    frontier_with_robots: DataFrame,
    now_utc_seconds_of_day: int,
    start_col: str = "visit_start_utc",
    end_col: str = "visit_end_utc",
) -> tuple[DataFrame, DataFrame]:
    """Split into (in_window, deferred). Hosts without a window (null
    start) are always crawlable; deferred rows stay in the frontier for
    a later epoch (the reference exits the process instead,
    scrape_pnp.py:75-77)."""
    ok = F.col(start_col).isNull() | in_visit_window(
        now_utc_seconds_of_day, F.col(start_col), F.col(end_col)
    )
    return frontier_with_robots.filter(ok), frontier_with_robots.filter(~ok)


def politeness_schedule(
    selected: DataFrame,
    epoch_budget_s: float,
    delay_col: str = "crawl_delay_s",
    default_delay_s: float = 10.0,
    host_col: str = "host",
    salt_col: str = "salt",
    n_salt_col: str = "n_salt",
    priority_col: str = "priority",
    seq_col: str = "seq",
) -> DataFrame:
    """R1 — per-(host, salt) window scheduler with a simulated clock.

    Within a host, consecutive fetches must be ≥ crawl_delay apart.
    With salting, each salt group runs a stride of ``delay × n_salt``
    offset by ``salt × delay`` — the union across salts preserves the
    per-host delay exactly while letting salts execute in parallel
    tasks (the skew escape hatch, north_rule).

    Emits ``scheduled_offset_ms`` (logical epoch time of the fetch),
    ``wait_ms`` (politeness wait this fetch incurred) and
    ``within_budget`` (false → caller defers the row to the next
    epoch). This is the engine's replacement for the reference's
    per-thread ``time.sleep`` loops (scrape_shoprite.py:419-428).

    CONTINUOUS mode (the batch composition of
    ``streaming.stateful.stateful_politeness``): when the input carries
    a ``carry_ms`` column — the per-(host, salt) wait still owed from
    the previous epoch, epochs being back-to-back budget windows — the
    group's first fetch is scheduled at ``carry + salt·delay`` and its
    ``wait_ms`` is that carry, so per-host spacing holds ACROSS epoch
    boundaries, not just within one. Absent (or null) carry ⇒ the
    original per-epoch restart.
    """
    in_cols = selected.columns
    for c in (salt_col, n_salt_col):
        if c not in in_cols:
            selected = selected.withColumn(c, F.lit(1 if c == n_salt_col else 0))
    if "carry_ms" not in selected.columns:
        selected = selected.withColumn("carry_ms", F.lit(0).cast("long"))
    else:
        selected = selected.withColumn("carry_ms", F.coalesce(F.col("carry_ms"), F.lit(0)).cast("long"))
    if delay_col in selected.columns:
        selected = selected.withColumn(delay_col, F.coalesce(F.col(delay_col), F.lit(default_delay_s)))
    else:
        selected = selected.withColumn(delay_col, F.lit(default_delay_s))
    budget_ms = int(epoch_budget_s * 1000)

    # Pure window arithmetic — 100% JVM-side (an earlier version was a
    # grouped-map pandas UDF; this was the last Python stage in the
    # frontier hot path, ~1/3 of the bench's schedule_sec). Per
    # (host, salt) the rows share delay/n_salt/carry (one robots row +
    # one state row per group), so per-row columns equal the group's
    # constants:
    #   k       = rank by (priority desc, seq asc) − 1
    #   stride  = delay · n_salt          (salts interleave the host's clock)
    #   offset  = carry + salt·delay + k·stride
    #   wait    = carry for the group's first fetch, stride after
    w = Window.partitionBy(host_col, salt_col).orderBy(F.col(priority_col).desc(), F.col(seq_col).asc())
    k = F.row_number().over(w) - 1
    delay_ms = (F.col(delay_col) * 1000).cast("long")
    n_salt = F.greatest(F.col(n_salt_col), F.lit(1)).cast("long")
    salt = F.when(n_salt > 1, F.col(salt_col).cast("long")).otherwise(F.lit(0))
    stride = delay_ms * n_salt
    offset = F.col("carry_ms") + salt * delay_ms + k * stride
    return (
        selected.withColumn("scheduled_offset_ms", offset)
        .withColumn("wait_ms", F.when(k == 0, F.col("carry_ms")).otherwise(stride))
        .withColumn("within_budget", offset < F.lit(budget_ms))
    )
