"""robots.txt text parser (R3 front half).

The reference repo *documents* its robots rules rather than parsing
them (README.md:61-67) and hardcodes the crawl delay + visit window
(scrape_pnp.py:46,53-63). A real crawler fetches each host's
``/robots.txt`` and derives the rules table; this stage turns a
DataFrame of ``(host, robots_body)`` into the engine's ``robots``
schema rows — entirely with built-in column expressions:

  split body → lines → group into user-agent blocks → keep blocks
  matching our UA (or ``*``) → collect Disallow prefixes + Crawl-delay.

Block attribution is done with a running ``last_ua`` (the window
``last(ua, ignoreNulls)`` over line order) — the standard trick for
"fill group label down from the most recent header row".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_UA = "CustomBot/1.0"  # scrape_pnp.py:50


def parse_robots_txt(df: DataFrame, user_agent: str = DEFAULT_UA, body_col: str = "robots_body") -> DataFrame:
    """(host, robots_body) → (host, crawl_delay_s, disallow array).

    Honors the most specific matching user-agent block: exact UA token
    match wins over ``*`` (standard precedence), per host.
    """
    ua_token = user_agent.split("/")[0].lower()

    lines = df.select(
        "host", F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("line_no", "line")
    ).select("host", "line_no", F.trim(F.regexp_replace("line", r"#.*$", "")).alias("line"))

    parsed = lines.select(
        "host",
        "line_no",
        F.lower(F.trim(F.regexp_extract("line", r"(?i)^user-agent:\s*(.+)$", 1))).alias("ua"),
        F.trim(F.regexp_extract("line", r"(?i)^disallow:\s*(\S*)", 1)).alias("disallow"),
        F.trim(F.regexp_extract("line", r"(?i)^crawl-delay:\s*([0-9.]+)", 1)).alias("delay"),
    )
    w = Window.partitionBy("host").orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
    attributed = parsed.withColumn(
        "block_ua", F.last(F.when(F.col("ua") != "", F.col("ua")), ignorenulls=True).over(w)
    ).filter(F.col("block_ua").isNotNull())

    relevant = attributed.filter(
        (F.col("block_ua") == "*") | (F.col("block_ua") == ua_token) | (F.col("block_ua") == user_agent.lower())
    ).withColumn("specific", (F.col("block_ua") != "*").cast("int"))

    per_host_spec = relevant.groupBy("host").agg(F.max("specific").alias("best"))
    chosen = relevant.join(F.broadcast(per_host_spec), "host").filter(F.col("specific") == F.col("best"))

    return chosen.groupBy("host").agg(
        F.max(F.when(F.col("delay") != "", F.col("delay").cast("double"))).alias("crawl_delay_s"),
        F.sort_array(F.collect_set(F.when(F.col("disallow") != "", F.col("disallow")))).alias("disallow"),
    )
