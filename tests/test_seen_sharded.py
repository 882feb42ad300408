"""Sharded Bloom seen-filter (the 10^10 design point, BASELINE north star).

Pins: (a) no false negatives — every added URL tests maybe_seen; (b) the
full new_urls path (prefilter + exact confirm) is SET-equal to the plain
anti-join and to the single-shard broadcast path; (c) incremental add_df
carries untouched shards across versions; (d) the membership plan
repartitions by shard (each task loads only its shard bitmap).
"""

import pytest
from pyspark.sql import functions as F

from mycelium_spark.operators.seen import BloomSeen, new_urls


def _urls(spark, lo, hi, tag="u"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"http://h{tag}"), (F.col("id") % 97).cast("string"),
                 F.lit(".example/"), F.col("id").cast("string")).alias("url")
    )


@pytest.fixture(scope="module")
def arrow(spark):
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark


def test_sharded_no_false_negatives(arrow, tmp_path):
    spark = arrow
    bloom = BloomSeen(num_bits=1 << 14, num_hashes=5, n_shards=8,
                      shard_dir=str(tmp_path / "b1"))
    seen = _urls(spark, 0, 2000)
    bloom.add_df(seen, "url")
    pref = bloom.prefilter(seen, "url")
    assert pref.filter(~F.col("maybe_seen")).count() == 0


def test_sharded_new_urls_equals_exact_and_broadcast(arrow, tmp_path):
    spark = arrow
    seen = _urls(spark, 0, 1500)
    cand = _urls(spark, 1000, 2500)  # 500 overlap, 1000 new
    exact = sorted(r["url"] for r in new_urls(cand, seen, None, "url").collect())
    b1 = BloomSeen(num_bits=1 << 16, num_hashes=5)
    b1.add_df(seen, "url")
    single = sorted(r["url"] for r in new_urls(cand, seen, b1, "url").collect())
    bk = BloomSeen(num_bits=1 << 13, num_hashes=5, n_shards=8,
                   shard_dir=str(tmp_path / "b2"))
    bk.add_df(seen, "url")
    sharded = sorted(r["url"] for r in new_urls(cand, seen, bk, "url").collect())
    assert len(exact) == 1000
    assert single == exact
    assert sharded == exact


def test_incremental_add_carries_untouched_shards(arrow, tmp_path):
    spark = arrow
    bloom = BloomSeen(num_bits=1 << 13, num_hashes=5, n_shards=16,
                      shard_dir=str(tmp_path / "b3"))
    first = _urls(spark, 0, 500)
    bloom.add_df(first, "url")
    # second add touches a disjoint url set (different tag → different shards mix)
    bloom.add_df(_urls(spark, 0, 50, tag="z"), "url")
    assert bloom.version == 2
    pref = bloom.prefilter(first, "url")
    assert pref.filter(~F.col("maybe_seen")).count() == 0  # first batch not lost


def test_membership_plan_partitions_by_shard(arrow, tmp_path):
    spark = arrow
    bloom = BloomSeen(num_bits=1 << 13, num_hashes=3, n_shards=4,
                      shard_dir=str(tmp_path / "b4"))
    bloom.add_df(_urls(spark, 0, 100), "url")
    pref = bloom.prefilter(_urls(spark, 0, 200), "url")
    plan = pref._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_shard" in plan


def test_crawl_engine_with_sharded_bloom_matches_default(arrow, tmp_path):
    """Full engine round loop with bloom_shards=4 produces the same doc/seen
    sets as the single-shard default (set parity is guaranteed by the exact
    confirm join; this pins the plumbing end-to-end)."""
    from mycelium_spark.plans.crawl import CrawlEngine
    from mycelium_spark.sources import synth

    spark = arrow
    pages = synth.pages_df(spark, 120, 8)
    seeds = [(i, synth.url_of(i)) for i in range(15)]
    results = {}
    for name, shards in (("single", 1), ("sharded", 4)):
        eng = CrawlEngine(
            spark, str(tmp_path / name), pages, per_host_budget=4,
            bloom_bits=1 << 13, bloom_shards=shards,
        )
        eng.seed(list(seeds))
        eng.run(max_rounds=3)
        results[name] = {
            "docs": sorted(r["url"] for r in eng.docs_latest().select("url").collect()),
            "seen": sorted(r["url"] for r in eng.cat.read("seen").select("url").collect()),
        }
    assert results["single"] == results["sharded"]


def test_versions_survive_until_expire_and_failed_build_keeps_version(arrow, tmp_path):
    import os

    spark = arrow
    d = tmp_path / "b5"
    bloom = BloomSeen(num_bits=1 << 13, num_hashes=3, n_shards=4, shard_dir=str(d))
    old_plan_input = _urls(spark, 0, 100)
    bloom.add_df(old_plan_input, "url")               # v1
    stale_plan = bloom.prefilter(old_plan_input, "url")  # lazy, bound to v1 paths
    bloom.add_df(_urls(spark, 100, 200), "url")       # v2
    bloom.add_df(_urls(spark, 200, 300), "url")       # v3
    # no GC inside add_df: the v1 files a 2-adds-old lazy plan needs still exist
    assert any(".v1." in f for f in os.listdir(d))
    assert stale_plan.filter(~F.col("maybe_seen")).count() == 0
    # explicit expire keeps the newest 2 versions only
    bloom.expire(keep=2)
    names = os.listdir(d)
    assert not any(".v1." in f for f in names)
    assert any(".v2." in f for f in names) and any(".v3." in f for f in names)

    # a FAILED distributed build must not advance the version
    class Boom(Exception):
        pass

    bad = spark.createDataFrame([("x",)], ["url"]).select(
        F.udf(lambda u: (_ for _ in ()).throw(ValueError("boom")), "string")("url").alias("url")
    )
    v_before = bloom.version
    try:
        bloom.add_df(bad, "url")
    except Exception:
        pass
    assert bloom.version == v_before
    # and membership against the last good version still works
    assert bloom.prefilter(old_plan_input, "url").filter(~F.col("maybe_seen")).count() == 0
