"""Adaptive recrawl scheduling: change-rate estimation from crawl
snapshot history.

A crawler that refetches everything at one cadence wastes most of its
budget on static pages while missing fast-changing ones. The published
fix (Cho & Garcia-Molina, "Estimating frequency of change", TOIT 2003)
estimates each URL's change rate from its observed fetch history and
allocates refresh budget accordingly. The reference engine's refresh
logic is a fixed is-it-older-than-X gate per doc (Doc.cc:155, surfaced
as S5 in plans/crawl.py); rate-adaptive scheduling is pipeline-brief
scope, and composes directly with the S5 path (this operator ranks,
S5's conditional fetch executes).

Estimator, made exact-integer so the DuckDB twin hash-matches
bit-for-bit (the PageRank fixed-point rule — float log/pow ulps
diverge across engines):

* per URL, successive snapshot digests give ``intervals`` Bernoulli
  observations of "changed since last fetch", ``changes`` of them
  positive;
* change probability is the Beta(1,1) posterior mean in millionths:
  ``p_millionths = ((changes + 1) * 1_000_000) div (intervals + 2)``
  — Laplace smoothing keeps never-changed and always-changed URLs off
  the degenerate 0/1 estimates the raw MLE gives;
* ``age_rounds`` is rounds since the last observed change (first
  observation when none) — the staleness the estimate applies to;
* ``priority_millionths = p_millionths * (age_rounds + 1)`` — the
  expected-unseen-changes proxy (the +1 covers the interval from the
  last snapshot to now), highest first;
* ``next_bucket`` coarsens p into the operational refresh tier
  (hourly / daily / weekly / monthly) for budget partitioning.

Scale shape: one window + one groupBy, both keyed by url — a single
shuffle of (url, round, 16-byte digest) tuples; page bodies never
enter (digests are computed in the snapshot scan projection, the
crawl_delta discipline). At 10^10 URLs the url-keyed exchange is the
same partitioning the frontier already uses, so a bucketed history
table makes this shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# p_millionths thresholds -> operational refresh tier
BUCKETS = ((500_000, "hourly"), (100_000, "daily"), (10_000, "weekly"))


def _bucket_sql(p: str) -> str:
    arms = " ".join(f"WHEN {p} >= {thr} THEN '{name}'" for thr, name in BUCKETS)
    return f"CASE {arms} ELSE 'monthly' END"


def recrawl_priorities(
    history: DataFrame,
    url_col: str = "url",
    round_col: str = "round",
    digest_col: str = "digest",
) -> DataFrame:
    """-> (age_rounds, changes, intervals, next_bucket, p_millionths,
    priority_millionths, url) per URL with >=1 observation."""
    w = Window.partitionBy(url_col).orderBy(round_col)
    obs = history.select(
        F.col(url_col).alias("url"),
        F.col(round_col).cast("long").alias("round"),
        F.col(digest_col).alias("digest"),
    ).withColumn("_prev", F.lag("digest").over(w))
    per = (
        obs.withColumn(
            "_chg",
            (F.col("_prev").isNotNull() & (F.col("digest") != F.col("_prev"))).cast(
                "long"
            ),
        )
        .groupBy("url")
        .agg(
            (F.count(F.lit(1)) - 1).cast("long").alias("intervals"),
            F.sum("_chg").cast("long").alias("changes"),
            F.max("round").alias("_last"),
            F.min("round").alias("_first"),
            F.max(F.when(F.col("_chg") == 1, F.col("round"))).alias("_last_chg"),
        )
    )
    return per.selectExpr(
        "CAST(_last - coalesce(_last_chg, _first) AS BIGINT) AS age_rounds",
        "changes",
        "intervals",
        "url",
    ).selectExpr(
        "age_rounds",
        "changes",
        "intervals",
        f"{_bucket_sql('((changes + 1) * 1000000) div (intervals + 2)')} AS next_bucket",
        "((changes + 1) * 1000000) div (intervals + 2) AS p_millionths",
        "(((changes + 1) * 1000000) div (intervals + 2)) * (age_rounds + 1) "
        "AS priority_millionths",
        "url",
    )


def recrawl_priorities_sql(history_sql: str) -> str:
    """DuckDB twin over a (url, round, digest) history subquery."""
    p = "((changes + 1) * 1000000) // (intervals + 2)"
    return f"""
WITH h AS ({history_sql}),
obs AS (
  SELECT url, CAST(round AS BIGINT) AS round, digest,
         lag(digest) OVER (PARTITION BY url ORDER BY round) AS prev
  FROM h
),
per AS (
  SELECT url,
         CAST(count(*) - 1 AS BIGINT) AS intervals,
         CAST(sum(CASE WHEN prev IS NOT NULL AND digest <> prev
                       THEN 1 ELSE 0 END) AS BIGINT) AS changes,
         max(round) AS last_r,
         min(round) AS first_r,
         max(CASE WHEN prev IS NOT NULL AND digest <> prev
                  THEN round END) AS last_chg
  FROM obs GROUP BY url
)
SELECT CAST(last_r - coalesce(last_chg, first_r) AS BIGINT) AS age_rounds,
       changes, intervals,
       {_bucket_sql(p)} AS next_bucket,
       CAST({p} AS BIGINT) AS p_millionths,
       CAST(({p}) * (last_r - coalesce(last_chg, first_r) + 1) AS BIGINT)
         AS priority_millionths,
       url
FROM per
"""
