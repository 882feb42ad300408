"""Crawl-delay enforcement (politeness extension, default OFF).

The reference parses Crawl-delay but never enforces it (Robots.hh:48 —
a matching CRAWL_DELAY rule even acts as a disallow in its rule-match
loop, pinned elsewhere). With ``enforce_crawl_delay=True`` a host
declaring delay d gets per-round budget
min(per_host_budget, max(1, floor(round_period_sec / d))); all other
hosts keep the full budget. Default-off parity: the flag absent must
schedule identically to round-1 behavior.
"""

import pytest
from pyspark.sql import functions as F

from mycelium_spark.plans.crawl import CrawlEngine


def _pages(spark, n_per_host=6):
    rows = []
    for host in ("slow.example", "fast.example"):
        for i in range(n_per_host):
            rows.append(
                (
                    f"http://{host}/p{i}",
                    bytearray(f"<html><body>doc {host} {i}</body></html>".encode()),
                    "2024-01-01T00:00:00Z",
                    "en",
                )
            )
    return spark.createDataFrame(rows, "url string, html binary, warc_ts string, lang string")


def _robots(spark):
    return spark.createDataFrame(
        [
            ("slow.example", 200, "User-agent: *\nCrawl-delay: 2.5\n"),
            ("fast.example", 200, "User-agent: *\n"),
        ],
        "host string, status int, robots_txt string",
    )


@pytest.mark.parametrize("enforce", [False, True])
def test_crawl_delay_budget(spark, tmp_path, enforce):
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    eng = CrawlEngine(
        spark, str(tmp_path / f"wd{enforce}"), _pages(spark), _robots(spark),
        per_host_budget=4, exact_robots=False,
        enforce_crawl_delay=enforce, round_period_sec=5.0,
    )
    seeds = [(i, f"http://slow.example/p{i}") for i in range(6)] + [
        (100 + i, f"http://fast.example/p{i}") for i in range(6)
    ]
    eng.seed(seeds)
    per_round_slow = []
    for _ in range(5):
        s = eng.run_round()
        docs = eng.cat.read("docs")
        slow_so_far = docs.filter(F.col("url").startswith("http://slow.")).count()
        per_round_slow.append(slow_so_far)
        if s.get("done"):
            break
    docs = eng.docs_latest()
    # everything crawled eventually in both modes
    assert docs.count() == 12
    slow_increments = [b - a for a, b in zip([0] + per_round_slow, per_round_slow)]
    if enforce:
        # Crawl-delay 2.5s, period 5s → budget floor(5/2.5)=2 per round
        assert max(slow_increments) <= 2
        assert len([x for x in slow_increments if x]) >= 3  # spread over rounds
    else:
        # parity: full budget 4 per round, done in 2 rounds for slow host
        assert max(slow_increments) == 4


def test_crawl_delay_larger_than_round_period(spark, tmp_path):
    """delay > round_period must NOT floor to one-fetch-every-round: a
    60 s delay with 5 s rounds means one fetch every ceil(60/5)=12 rounds
    (ADVICE round 2). With 3 queued URLs, rounds 0..11 fetch exactly one
    slow-host URL (round 0), the next at round 12."""
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    pages = _pages(spark, n_per_host=3)
    robots = spark.createDataFrame(
        [
            ("slow.example", 200, "User-agent: *\nCrawl-delay: 60\n"),
            ("fast.example", 200, "User-agent: *\n"),
        ],
        "host string, status int, robots_txt string",
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "wd_large"), pages, robots,
        per_host_budget=4, exact_robots=False,
        enforce_crawl_delay=True, round_period_sec=5.0,
    )
    eng.seed(
        [(i, f"http://slow.example/p{i}") for i in range(3)]
        + [(100 + i, f"http://fast.example/p{i}") for i in range(3)]
    )
    slow_counts = []
    for _ in range(13):
        eng.run_round()
        docs = eng.cat.read("docs")
        slow_counts.append(
            docs.filter(F.col("url").startswith("http://slow.")).count()
        )
    # round 0 fetches 1, rounds 1-11 fetch none, round 12 fetches the 2nd
    assert slow_counts[0] == 1
    assert slow_counts[11] == 1
    assert slow_counts[12] == 2
