"""Link-spam host features: the degree-structure signals of link
farms.

PageRank (operators/linkgraph.py) assumes links are editorial votes;
link farms break that assumption, and the published countermeasures
start from cheap degree-structure features — Fetterly et al., "Spam,
damn spam, and statistics" (WebDB 2004) and Becchetti et al.'s
link-based spam detection both rank hosts by exactly these before any
expensive propagation (TrustRank) runs. The reference engine stops at
the link sink (S10), so the feature pass is pipeline-brief scope.

Features per host, over the DISTINCT host-level edge set (the
pagerank discipline — multiplicity is not evidence):

* ``out_deg`` / ``in_deg`` — distinct partner counts each way;
* ``recip_links`` — out-partners that link back (A<->B): farms
  exchange links pairwise, so reciprocity near 1 is the classic flag;
  ``recip_milli`` is the exact thousandths ratio over out_deg;
* ``self_links`` — self-loop present (0/1);
* ``ratio_milli`` — out/in imbalance ((out+1)/(in+1) in thousandths):
  spam hosts link out in bulk and earn little back.

Scoring/thresholds stay with the caller (they are corpus-calibrated);
this operator is the feature table, exact-integer throughout.

Scale shape: distinct-edge dedup shuffles once on (src, dst);
reciprocity is ONE self-equi-join of the deduped edge table on the
reversed key (src=dst AND dst=src never expands — at most one match
per edge); degrees are map-side-combined groupBys; the final assembly
is outer equi-joins on host. Nothing broadcasts at graph scale, no
windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linkspam_features(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """-> (host, in_deg, out_deg, ratio_milli, recip_links, recip_milli,
    self_links) per host appearing on either edge side."""
    e = edges.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
    ).distinct()
    plain = e.filter("src <> dst")
    out_deg = plain.groupBy(F.col("src").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("out_deg")
    )
    in_deg = plain.groupBy(F.col("dst").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("in_deg")
    )
    rev = plain.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (
        plain.join(rev, ["src", "dst"])
        .groupBy(F.col("src").alias("host"))
        .agg(F.count(F.lit(1)).cast("long").alias("recip_links"))
    )
    selfs = (
        e.filter("src = dst")
        .select(F.col("src").alias("host"))
        .distinct()
        .withColumn("self_links", F.lit(1).cast("long"))
    )
    hosts = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    return (
        hosts.join(out_deg, "host", "left")
        .join(in_deg, "host", "left")
        .join(recip, "host", "left")
        .join(selfs, "host", "left")
        .selectExpr(
            "host",
            "coalesce(in_deg, 0) AS in_deg",
            "coalesce(out_deg, 0) AS out_deg",
            "((coalesce(out_deg, 0) + 1) * 1000) div (coalesce(in_deg, 0) + 1) "
            "AS ratio_milli",
            "coalesce(recip_links, 0) AS recip_links",
            "CASE WHEN coalesce(out_deg, 0) = 0 THEN 0 "
            "ELSE (coalesce(recip_links, 0) * 1000) div out_deg END AS recip_milli",
            "coalesce(self_links, 0) AS self_links",
        )
        .select(
            "host", "in_deg", "out_deg", "ratio_milli", "recip_links",
            "recip_milli", "self_links",
        )
    )


def linkspam_features_sql(edges_sql: str) -> str:
    """DuckDB twin over a (src, dst) subquery."""
    return f"""
WITH e AS (SELECT DISTINCT CAST(src AS VARCHAR) AS src,
                  CAST(dst AS VARCHAR) AS dst FROM ({edges_sql})),
plain AS (SELECT * FROM e WHERE src <> dst),
od AS (SELECT src AS host, CAST(count(*) AS BIGINT) AS out_deg
       FROM plain GROUP BY src),
idg AS (SELECT dst AS host, CAST(count(*) AS BIGINT) AS in_deg
        FROM plain GROUP BY dst),
rc AS (
  SELECT a.src AS host, CAST(count(*) AS BIGINT) AS recip_links
  FROM plain a JOIN plain b ON a.src = b.dst AND a.dst = b.src
  GROUP BY a.src
),
sl AS (SELECT DISTINCT src AS host, CAST(1 AS BIGINT) AS self_links
       FROM e WHERE src = dst),
hosts AS (SELECT src AS host FROM e UNION SELECT dst FROM e)
SELECT h.host,
       coalesce(idg.in_deg, 0) AS in_deg,
       coalesce(od.out_deg, 0) AS out_deg,
       ((coalesce(od.out_deg, 0) + 1) * 1000) // (coalesce(idg.in_deg, 0) + 1)
         AS ratio_milli,
       coalesce(rc.recip_links, 0) AS recip_links,
       CASE WHEN coalesce(od.out_deg, 0) = 0 THEN 0
            ELSE (coalesce(rc.recip_links, 0) * 1000) // od.out_deg
            END AS recip_milli,
       coalesce(sl.self_links, 0) AS self_links
FROM hosts h
LEFT JOIN od ON h.host = od.host
LEFT JOIN idg ON h.host = idg.host
LEFT JOIN rc ON h.host = rc.host
LEFT JOIN sl ON h.host = sl.host
"""
