"""Politeness scheduling — the distributed frontier recipe (SURVEY.md §2.4).

The reference binds each host to one curl handle and serves ≤1 concurrent
request per host (Url_classifier.cc:70-94; crawler.rst:4). Distributed
mapping:

* per-host FIFO: ``row_number() OVER (PARTITION BY host ORDER BY seq)``;
* per-round politeness budget B: rows ranked ≤ B are scheduled this round,
  the rest are deferred to the next round — with 5 s scheduler ticks, B
  rounds ≈ B sequential fetches per host, reproducing the ≤1-in-flight
  invariant at round granularity;
* host→worker affinity: ``pmod(xxhash64(host), n_buckets)`` replaces the
  first-empty-subqueue binding (deterministic, shuffle-friendly);
* skew: a hot host's *scheduled* rows (budget already enforced per host!)
  can be salted across ``n_salt`` sub-partitions for the fetch/extract
  stage so one executor doesn't own 30% of the corpus.

Scale notes (10^10 frontier): the window shuffle partitions by host —
at ~10^7-10^8 hosts this is well distributed; the single pathological case
(one host with 10^9 queued URLs) is bounded by the budget filter which is
applied map-side after the shuffle, so only B rows per host survive the
stage. No global ordering is ever materialized; arrival seq is assigned
per-round via sort + zipWithIndex (two linear passes, no single-partition
bottleneck).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def politeness_schedule(
    frontier: DataFrame,
    per_host_budget: int,
    host_col: str = "host",
    seq_col: str = "seq",
    salt: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Split the frontier into (scheduled, deferred) for one round.

    Scheduled rows carry ``host_pos`` (1-based FIFO position within host,
    the politeness rank) matching the reference's per-host pop order.

    ``salt > 1`` enables the two-phase skew-resistant plan: phase 1 windows
    over (host, hash(url) % salt) and keeps the per-salt top-B (everything
    beyond is deferred WITHOUT a join — it can't be in the global top-B);
    phase 2 windows over host on at most salt*B rows per host. The hot-host
    straggler task drops from sorting the whole backlog to sorting salt*B
    rows. Identical output to the single-window plan.
    """
    if salt <= 1:
        w = Window.partitionBy(host_col).orderBy(seq_col)
        ranked = frontier.withColumn("host_pos", F.row_number().over(w))
        scheduled = ranked.filter(F.col("host_pos") <= per_host_budget)
        deferred = ranked.filter(F.col("host_pos") > per_host_budget).drop("host_pos")
        return scheduled, deferred
    cols = frontier.columns
    salted = frontier.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt))
    )
    w1 = Window.partitionBy(host_col, "_salt").orderBy(seq_col)
    pre = salted.withColumn("_pos1", F.row_number().over(w1))
    survivors = pre.filter(F.col("_pos1") <= per_host_budget)
    deferred_far = pre.filter(F.col("_pos1") > per_host_budget).select(*cols)
    w2 = Window.partitionBy(host_col).orderBy(seq_col)
    ranked = survivors.withColumn("host_pos", F.row_number().over(w2))
    scheduled = ranked.filter(F.col("host_pos") <= per_host_budget).drop("_salt", "_pos1")
    deferred_near = ranked.filter(F.col("host_pos") > per_host_budget).select(*cols)
    return scheduled, deferred_near.unionByName(deferred_far)


def with_worker_bucket(
    df: DataFrame, n_buckets: int, host_col: str = "host", n_salt: int = 8,
    salt_threshold: int = 64,
) -> DataFrame:
    """Host→worker binding + hot-host salting for the fetch/extract stage.

    ``bucket`` is the politeness affinity (hash(host) % n_buckets);
    ``salt`` splits hosts whose scheduled row count exceeds
    ``salt_threshold`` across sub-partitions. Budget was enforced BEFORE
    salting, so politeness is preserved.
    """
    counts = df.groupBy(host_col).agg(F.count(F.lit(1)).alias("_host_n"))
    out = (
        df.join(F.broadcast(counts), host_col)
        .withColumn("bucket", F.pmod(F.xxhash64(F.col(host_col)), F.lit(n_buckets)))
        .withColumn(
            "salt",
            F.when(
                F.col("_host_n") > salt_threshold,
                F.pmod(F.xxhash64(F.col("url")), F.lit(n_salt)),
            ).otherwise(F.lit(0)),
        )
        .drop("_host_n")
    )
    return out.repartition(n_buckets, F.col("bucket"), F.col("salt"))


def assign_seq(df: DataFrame, order_cols: list[str], base: int, seq_col: str = "seq") -> DataFrame:
    """Deterministic dense sequence without a single-partition window.

    Sorts by ``order_cols`` (range partitioner → balanced) and uses
    ``zipWithIndex`` (computes per-partition offsets in one extra job).
    """
    spark = df.sparkSession
    sdf = df.orderBy(*order_cols)
    schema = sdf.schema
    rdd = sdf.rdd.zipWithIndex().map(lambda t: (*t[0], base + t[1]))
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(list(schema.fields) + [StructField(seq_col, LongType(), False)])
    return spark.createDataFrame(rdd, out_schema)
