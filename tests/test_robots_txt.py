"""robots.txt text parser → rules table (R3 front half)."""

from retailer_scrapers_spark.sources.robots_txt import parse_robots_txt

BODY_A = """
# comments ignored
User-agent: *
Disallow: /checkout
Crawl-delay: 5

User-agent: CustomBot
Disallow: /private
Disallow: /cart
Crawl-delay: 10
"""

BODY_B = """
User-agent: OtherBot
Disallow: /

User-agent: *
Disallow: /search
Crawl-delay: 2.5
"""

BODY_EMPTY = "User-agent: *\nDisallow:\n"


def test_parse_robots(spark):
    df = spark.createDataFrame(
        [("a.test", BODY_A), ("b.test", BODY_B), ("c.test", BODY_EMPTY)], "host string, robots_body string"
    )
    out = {r.host: r for r in parse_robots_txt(df, "CustomBot/1.0").collect()}
    # a.test: the specific CustomBot block wins over *
    assert out["a.test"].crawl_delay_s == 10.0
    assert sorted(out["a.test"].disallow) == ["/cart", "/private"]
    # b.test: only * matches (OtherBot block ignored)
    assert out["b.test"].crawl_delay_s == 2.5
    assert out["b.test"].disallow == ["/search"]
    # c.test: empty Disallow → allow everything
    assert out["c.test"].disallow == []
    assert out["c.test"].crawl_delay_s is None
