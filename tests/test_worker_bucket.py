"""with_worker_bucket: host→worker affinity + hot-host salting.

Round-2 verdict (What's wrong #1): the per-host count table used to be
groupBy'd and BROADCAST — one row per distinct scheduled host through the
driver, a scale-killer at 10^7-10^8 hosts. These tests pin (a) the
behavior and (b) the plan: the count now comes from a window over host, so
NO BroadcastExchange may appear in the executed plan at all.
"""

from pyspark.sql import functions as F

from mycelium_spark.operators.frontier import with_worker_bucket


def _frontier(spark, n_hot=100, n_cold_hosts=20):
    hot = [(f"http://hot.example/p{i}", "hot.example") for i in range(n_hot)]
    cold = [
        (f"http://site{h}.example/p{i}", f"site{h}.example")
        for h in range(n_cold_hosts)
        for i in range(3)
    ]
    return spark.createDataFrame(hot + cold, ["url", "host"])


def test_bucket_deterministic_per_host_and_salt_only_hot(spark):
    df = _frontier(spark)
    out = with_worker_bucket(df, n_buckets=8, n_salt=4, salt_threshold=64)
    rows = out.collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, set()).add((r.bucket, r.salt))
    # every host maps to exactly one bucket
    for host, bs in by_host.items():
        assert len({b for b, _ in bs}) == 1, host
    # hot host (100 rows > 64) fans out across salts; cold hosts stay at 0
    assert len({s for _, s in by_host["hot.example"]}) > 1
    for host, bs in by_host.items():
        if host != "hot.example":
            assert {s for _, s in bs} == {0}, host


def test_no_broadcast_in_plan(spark):
    df = _frontier(spark)
    out = with_worker_bucket(df, n_buckets=8)
    out.count()  # execute so AQE finalizes the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" not in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_repartitioned_by_bucket_salt(spark):
    df = _frontier(spark)
    out = with_worker_bucket(df, n_buckets=4, n_salt=2, salt_threshold=64)
    # rows with the same (bucket, salt) land in the same partition
    pid = out.withColumn("_pid", F.spark_partition_id())
    n = (
        pid.groupBy("bucket", "salt")
        .agg(F.countDistinct("_pid").alias("np"))
        .agg(F.max("np"))
        .collect()[0][0]
    )
    assert n == 1
