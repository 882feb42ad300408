"""assign_seq: dense deterministic sequence, JVM-only plan.

The crawl round's new-frontier stage calls this every round; round 1 flagged
the old rdd.zipWithIndex implementation as the hot-path scale-killer (every
row serialized driver-format -> Python -> JVM). These tests pin (a) dense
0..n-1 correctness in sort order across skewed partition layouts, (b) base
offsets, and (c) the plan staying JVM-side (no Python eval nodes).
"""

from pyspark.sql import functions as F

from mycelium_spark.operators.frontier import assign_seq


def test_dense_sequence_matches_sort_order(spark):
    rows = [(i * 7919 % 1000, f"u{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, ["k", "url"]).repartition(7)
    out = assign_seq(df, ["k", "url"], base=0).collect()
    assert sorted(r["seq"] for r in out) == list(range(1000))
    by_seq = sorted(out, key=lambda r: r["seq"])
    assert by_seq == sorted(out, key=lambda r: (r["k"], r["url"]))


def test_base_offset_and_duplicate_keys(spark):
    # duplicate order keys: sequence still dense, one seq per row
    rows = [(i % 5, i) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "i"])
    out = assign_seq(df, ["k", "i"], base=1000).collect()
    assert sorted(r["seq"] for r in out) == list(range(1000, 1200))


def test_more_partitions_than_rows(spark):
    df = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], ["k", "v"])
    out = {r["v"]: r["seq"] for r in assign_seq(df, ["k"], base=0, n_parts=16).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}


def test_plan_is_jvm_only(spark):
    df = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("u"), F.col("id")).alias("url")
    )
    plan = assign_seq(df, ["k"], base=0)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Scan ExistingRDD"):
        assert marker not in plan, f"Python/RDD node in assign_seq plan: {marker}"
