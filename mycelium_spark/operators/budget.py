"""Per-host crawl-budget apportionment: exact largest-remainder
allocation of a round's global fetch budget.

A crawl round has a global fetch budget (fleet capacity x round
length); the scheduler must split it across hosts in proportion to
host priority (PageRank score, quota class, politeness ceiling)
while allocating every unit — the integer apportionment problem. The
published exact answer is Hamilton's largest-remainder method: each
host gets floor(budget * w / W), and the leftover units go to the
largest division remainders, one each. The reference engine schedules
per-host by fixed politeness budget alone (Crawl-delay windows,
frontier.py Q5); priority-proportional apportionment is
pipeline-brief scope, sitting between pagerank_hosts (the weights)
and the politeness window (the per-host executor).

Everything is integer arithmetic — quotient, remainder, rank — so the
DuckDB twin hash-matches bit-for-bit (ties on remainder break by host
ascending, a total order).

Scale shape: the naive remainder-rank is row_number() over an
UNPARTITIONED window — the single-reducer anti-pattern. This uses the
two-phase rank (the sampling.py prefix-sum discipline): rows bucket by
remainder range (256 even slices of [0, W), so bucket order is a
prefix of the global remainder order), 256 bucket counts come to the
driver for an O(256) offset scan, and the within-bucket rank is a
window partitioned BY bucket — fully parallel, bit-identical to the
global window at any partitioning. One groupBy-free pass otherwise:
the weight-sum scalar broadcasts back as a literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 256


def apportion_budget(
    hosts: DataFrame,
    budget: int,
    host_col: str = "host",
    weight_col: str = "weight",
) -> DataFrame:
    """-> (base, bonus, host, quota, rem, weight) per host row.

    ``weight`` must be a non-negative integer priority; quotas sum to
    exactly ``budget`` (all-zero weights degenerate to host-ascending
    round-robin of the whole budget via the remainder ranks)."""
    h = hosts.select(
        F.col(host_col).alias("host"), F.col(weight_col).cast("long").alias("weight")
    )
    agg = h.groupBy().agg(
        F.sum("weight").alias("w"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    total_w, n_hosts = int(agg["w"] or 0), int(agg["n"])
    if n_hosts == 0:
        return h.selectExpr(
            "CAST(0 AS BIGINT) AS base", "CAST(0 AS BIGINT) AS bonus", "host",
            "CAST(0 AS BIGINT) AS quota", "CAST(0 AS BIGINT) AS rem", "weight",
        )
    if total_w == 0:
        # degenerate uniform case: every remainder is 0; rank order is
        # host ascending, so round-robin falls out of the same machinery
        h = h.withColumn("weight", F.lit(0).cast("long"))
        total_w_eff = n_hosts
        base_expr = f"CAST({budget} div {n_hosts} AS BIGINT)"
        rem_expr = "CAST(1 AS BIGINT)"  # uniform: ties everywhere
        leftover = budget % n_hosts
    else:
        total_w_eff = total_w
        base_expr = f"CAST(({budget} * weight) div {total_w} AS BIGINT)"
        rem_expr = f"CAST(({budget} * weight) % {total_w} AS BIGINT)"
        leftover = budget - (
            h.selectExpr(f"sum({base_expr}) AS s").collect()[0]["s"] or 0
        )
    with_rem = h.selectExpr("host", "weight", f"{base_expr} AS base", f"{rem_expr} AS rem")
    # two-phase global rank by (rem DESC, host ASC): bucket by remainder
    # slice (descending bucket id = descending remainder prefix)
    bucketed = with_rem.withColumn(
        "_b",
        F.expr(
            f"(({total_w_eff - 1} - rem) * {N_BUCKETS}) div {total_w_eff}"
        ).cast("long"),
    )
    counts = {
        r["_b"]: r["c"]
        for r in bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_b").orderBy(F.desc("rem"), F.asc("host"))
    ranked = bucketed.withColumn(
        "_rank", F.row_number().over(w) + off_map[F.col("_b")]
    )
    return ranked.selectExpr(
        "base",
        f"CAST(CASE WHEN _rank <= {leftover} THEN 1 ELSE 0 END AS BIGINT) AS bonus",
        "host",
        f"CAST(base + CASE WHEN _rank <= {leftover} THEN 1 ELSE 0 END AS BIGINT) AS quota",
        "rem",
        "weight",
    )


def apportion_budget_sql(hosts_sql: str, budget: int) -> str:
    """DuckDB twin over a (host, weight) subquery — the oracle side
    uses the plain global window (scale is not its concern)."""
    return f"""
WITH h AS (SELECT host, CAST(weight AS BIGINT) AS weight FROM ({hosts_sql})),
tot AS (SELECT sum(weight) AS w, count(*) AS n FROM h),
d AS (
  SELECT host, weight,
         CASE WHEN tot.w = 0 THEN {budget} // tot.n
              ELSE ({budget} * weight) // tot.w END AS base,
         CASE WHEN tot.w = 0 THEN 1
              ELSE ({budget} * weight) % tot.w END AS rem
  FROM h, tot
),
lo AS (SELECT {budget} - sum(base) AS leftover FROM d),
r AS (
  SELECT d.*, row_number() OVER (ORDER BY rem DESC, host ASC) AS rk,
         lo.leftover
  FROM d, lo
)
SELECT CAST(base AS BIGINT) AS base,
       CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS bonus,
       host,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota,
       CAST(rem AS BIGINT) AS rem,
       weight
FROM r
"""
