"""Crawl-snapshot delta: the added / changed / gone / unchanged split.

Archived crawls are published as periodic snapshots, and every consumer
asks the same first question: what changed since the one I already
processed? (Common Crawl publishes exactly this as its per-crawl "new
URLs" statistics; incremental index maintenance and recrawl scheduling
both start from it.) The reference's conditional-refresh path
(Doc.cc:155, surfaced as S5 in plans/crawl.py) answers it one URL at a
time at fetch time; this operator answers it corpus-to-corpus.

Semantics: full outer join of two snapshots on the URL key, content
compared by md5 digest —

* ``added``     — in new only;
* ``gone``      — in old only;
* ``changed``   — in both, digests differ;
* ``unchanged`` — in both, digests equal.

Scale shape: ONE full-outer equi-join on url (AQE-coalesced; both
sides shuffle-partition on the same key so a bucketed/pre-partitioned
catalog table makes it co-located and shuffle-free), digests computed
in the scan projection so document bodies never move — only
(url, 16-byte digest) pairs enter the join. The follow-up summary is a
map-side-combined groupBy(status) of 4 groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """→ (url, status, old_digest, new_digest); status in
    added|gone|changed|unchanged."""
    o = old.select(
        F.col(url_col).alias("url"),
        F.md5(F.col(text_col).cast("binary")).alias("old_digest"),
    )
    n = new.select(
        F.col(url_col).alias("url"),
        F.md5(F.col(text_col).cast("binary")).alias("new_digest"),
    )
    return o.join(n, "url", "full_outer").select(
        "url",
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("gone"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        # absent side → '' (not NULL): downstream sorts/compares stay
        # total-ordered, and the driver hash needs no NULL convention
        F.coalesce("old_digest", F.lit("")).alias("old_digest"),
        F.coalesce("new_digest", F.lit("")).alias("new_digest"),
    )


def snapshot_delta_sql(old_source: str, new_source: str) -> str:
    """DuckDB twin: identical digesting and status split over two
    snapshot-shaped subqueries (url, text)."""
    return f"""
WITH o AS (SELECT url, md5(text) AS old_digest FROM {old_source}),
n AS (SELECT url, md5(text) AS new_digest FROM {new_source})
SELECT coalesce(o.url, n.url) AS url,
       CASE WHEN o.old_digest IS NULL THEN 'added'
            WHEN n.new_digest IS NULL THEN 'gone'
            WHEN o.old_digest = n.new_digest THEN 'unchanged'
            ELSE 'changed' END AS status,
       coalesce(o.old_digest, '') AS old_digest,
       coalesce(n.new_digest, '') AS new_digest
FROM o FULL OUTER JOIN n ON o.url = n.url
"""
