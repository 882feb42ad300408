"""One-off scale rehearsal for the round-5b operators (the 100x design
audit): each leg synthesizes its input distributed (spark.range + JVM
exprs — no parquet, no Python) at ~100M rows and measures wall/
throughput on local[32]. CPU steal is sampled around each leg, same
convention as bench.py's one-shot legs. Results go to stdout as JSON
lines and get transcribed into BASELINE.md.

Run: python scripts/scale_rehearsal_r5b.py [leg ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _cpu_stat():
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def _steal(b, a):
    dt = a[0] - b[0]
    return round(100.0 * (a[1] - b[1]) / dt, 2) if dt else 0.0


def force(df):
    """Consume EVERY output column — a bare .count() lets Catalyst
    prune the aggregates/windows under test (measured: hll@100M
    "ran" in 1.1s with its registers pruned away)."""
    from pyspark.sql import functions as FF

    return df.select(
        FF.sum(FF.hash(*[FF.col(c) for c in df.columns])).alias("h")
    ).collect()[0]["h"]


def leg(name, fn):
    b = _cpu_stat()
    t0 = time.time()
    n = fn()
    wall = time.time() - t0
    a = _cpu_stat()
    print(
        json.dumps(
            {
                "leg": name,
                "rows": n,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(n / wall),
                "cpu_steal_pct": _steal(b, a),
            }
        ),
        flush=True,
    )


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "256")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "96g")
        .config("spark.ui.enabled", "false")
        .appName("scale-rehearsal-r5b")
        .getOrCreate()
    )
    want = set(sys.argv[1:])

    def on(x):
        return not want or x in want

    N = 100_000_000

    if on("trap_filter"):
        from mycelium_spark.operators import traps

        urls = spark.range(N).selectExpr(
            "id AS doc_id",
            "'http://h' || CAST(id % 1000000 AS STRING) || '.ex' || "
            "CASE CAST(id % 13 AS INT) "
            "WHEN 0 THEN '/cat/page/cat/page/cat/page/x' "
            "WHEN 1 THEN '/a/b/c/d/e/f/g/h/i/j/k/l/m' "
            "WHEN 4 THEN '/p;jsessionid=ABC' || CAST(id AS STRING) "
            "ELSE '/p' || CAST(id AS STRING) || '.html' END AS url",
        )
        leg(
            "trap_filter@100M",
            lambda: traps.detect_traps(urls)
            .filter("NOT trap")
            .selectExpr("count(*) AS c")
            .collect()[0]["c"]
            and N,
        )

    if on("url_patterns"):
        from mycelium_spark.operators import urlpatterns

        urls = spark.range(N).selectExpr(
            "'http://h' || CAST(id % 1000000 AS STRING) || '.ex' || "
            "CASE WHEN id % 3 = 0 THEN '/item/' || CAST(id AS STRING) "
            "WHEN id % 3 = 1 THEN '/p' || CAST(id % 7 AS STRING) || "
            "'/page?id=' || CAST(id AS STRING) "
            "ELSE '/static/about' END AS url",
        )
        leg(
            "url_patterns@100M",
            lambda: force(urlpatterns.url_patterns(urls)) and N,
        )

    if on("hll"):
        from mycelium_spark.operators import hll

        d = spark.range(N).selectExpr(
            "'h' || CAST(id % 64 AS STRING) AS host",
            # ~25M distinct keys spread over 64 hosts
            "'/u' || CAST((id * 2654435761) % 25000000 AS STRING) AS url",
        )
        leg("hll@100M", lambda: force(hll.approx_distinct(d, "url", "host")) and N)
        leg(
            "exact_distinct@100M(control)",
            lambda: force(d.groupBy("host").agg(F.countDistinct("url").alias("n")))
            and N,
        )

    if on("recrawl"):
        from mycelium_spark.operators import recrawl

        hist = spark.range(N).selectExpr(
            "'http://h' || CAST(id % 25000000 AS STRING) || '.ex/p' AS url",
            "id div 25000000 AS round",
            "md5(CAST(CASE WHEN (id % 25000000) % 3 = 0 "
            "THEN id div 25000000 ELSE 0 END AS STRING)) AS digest",
        )
        leg(
            "recrawl@100M(25M urls x 4 rounds)",
            lambda: force(recrawl.recrawl_priorities(hist)) and N,
        )

    if on("budget"):
        from mycelium_spark.operators import budget

        hosts = spark.range(10_000_000).selectExpr(
            "'h' || CAST(id AS STRING) AS host",
            "(id * id) % 1009 + 1 AS weight",
        )
        leg(
            "budget_apportion@10M hosts",
            lambda: budget.apportion_budget(hosts, 1_000_000_000)
            .selectExpr("sum(quota) AS s")
            .collect()[0]["s"]
            == 1_000_000_000
            and 10_000_000,
        )

    spark.stop()


if __name__ == "__main__":
    main()
