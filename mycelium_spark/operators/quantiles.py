"""Exact distributed percentiles over a bounded integer domain.

Corpus reports quote "median / p90 / p99 document length (tokens,
bytes)" — and at 10^10 documents the naive routes are both wrong:
a global ORDER BY rank is the single-reducer anti-pattern, and
``percentile_approx`` is a sketch whose innards no oracle can check.
For bounded integer measures (lengths, token counts, status codes,
depths) the exact answer is cheap: aggregate to a VALUE HISTOGRAM
first — cardinality is the value domain, not the corpus — then rank
the histogram.

The histogram's cumulative sum uses the repo's two-phase prefix-sum
discipline (sampling.py): values bucket into 256 even slices of
[0, max], per-bucket totals take an O(256) driver scan, and the
within-bucket cumulative window partitions BY bucket — no
single-reducer stage even when the value domain is large. The
percentile then reads off as the smallest value whose cumulative
count reaches ceil(n * p / 1000) — all integer, so the DuckDB twin
(a plain global window; scale is not its concern) hash-matches
exactly. This is the nearest-rank percentile definition (no
interpolation — the answer is always a value that exists).

Scale shape: one map-side-combined groupBy(value), two bounded driver
scalars (max value, total count), 256 bucket offsets, per-bucket
windows, and a final aggregation over |ps| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 256
PS_DEFAULT = (500, 900, 990)  # permille


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    ps: tuple[int, ...] = PS_DEFAULT,
) -> DataFrame:
    """-> (n_le, p_milli, value) per requested permille: the
    nearest-rank percentile of a non-negative integer column, with
    ``n_le`` = how many rows are <= it."""
    vals = df.select(F.col(value_col).cast("long").alias("v"))
    hist = vals.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    scal = vals.groupBy().agg(
        F.max("v").alias("mx"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    if not scal["n"]:
        return df.sparkSession.createDataFrame(
            [], "n_le long, p_milli long, value long"
        )
    mx, n = int(scal["mx"]), int(scal["n"])
    bucketed = hist.withColumn(
        "_b", F.expr(f"(v * {N_BUCKETS}) div {mx + 1}").cast("long")
    )
    counts = {
        r["_b"]: r["s"]
        for r in bucketed.groupBy("_b").agg(F.sum("c").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_b").orderBy("v")
    cum = bucketed.withColumn(
        "cum", F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
        + off_map[F.col("_b")]
    )
    targets = [(p, -(-n * p // 1000)) for p in ps]  # ceil(n*p/1000)
    picks = None
    for p, k in targets:
        pick = (
            cum.filter(F.col("cum") >= k)
            .groupBy()
            .agg(
                F.min("v").alias("value"),
                F.lit(p).cast("long").alias("p_milli"),
            )
        )
        picks = pick if picks is None else picks.unionByName(pick)
    return (
        picks.join(cum.select(F.col("v").alias("value"), "cum"), "value")
        .selectExpr("cum AS n_le", "p_milli", "value")
        .select("n_le", "p_milli", "value")
    )


def exact_percentiles_sql(
    df_sql: str, value_col: str, ps: tuple[int, ...] = PS_DEFAULT
) -> str:
    """DuckDB twin over any subquery; plain global window (the oracle
    does not need the two-phase treatment)."""
    arms = " UNION ALL ".join(
        f"SELECT (SELECT min(v) FROM cum WHERE cum >= "
        f"CAST(ceil((SELECT n FROM nn) * {p} / 1000.0) AS BIGINT)) AS value, "
        f"CAST({p} AS BIGINT) AS p_milli"
        for p in ps
    )
    return f"""
WITH vals AS (SELECT CAST({value_col} AS BIGINT) AS v FROM ({df_sql})),
hist AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY v),
nn AS (SELECT count(*) AS n FROM vals),
cum AS (
  SELECT v, sum(c) OVER (ORDER BY v
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hist
),
picks AS ({arms})
SELECT CAST(cum.cum AS BIGINT) AS n_le, picks.p_milli, picks.value
FROM picks JOIN cum ON picks.value = cum.v
"""
