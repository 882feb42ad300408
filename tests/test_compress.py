"""Compression-ratio filter: both drop modes, the empty-doc sentinel,
integer-exact ratios, and the no-shuffle plan shape."""

import zlib

from mycelium_spark.operators import compress


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r for r in compress.compression_filter(df).collect()}


def test_branches(spark):
    normal = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sailors argue about navigation charts and the price of salted "
        "fish in a harbor town long past its prime era of trade"
    )
    out = _run(
        spark,
        [
            normal,  # natural text: keep
            "spam " * 400,  # deflates to nothing: repetition drop
            "hi",  # zlib overhead > payload: ratio > 1000, drop
            "",  # empty: sentinel, drop
        ],
    )
    assert out[0]["keep"]
    assert not out[1]["keep"] and out[1]["ratio_milli"] < 250
    assert not out[2]["keep"] and out[2]["ratio_milli"] > 1000
    assert not out[3]["keep"] and out[3]["ratio_milli"] == compress.EMPTY_SENTINEL
    assert out[3]["raw_len"] == 0


def test_exact_integer_ratio(spark):
    t = "abcdefgh " * 50
    out = _run(spark, [t])
    raw = len(t.encode("utf-8"))
    comp = len(zlib.compress(t.encode("utf-8"), compress.LEVEL_DEFAULT))
    assert out[0]["raw_len"] == raw and out[0]["comp_len"] == comp
    assert out[0]["ratio_milli"] == (comp * 1000) // raw


def test_multibyte_lengths_are_bytes(spark):
    t = "éèê " * 100  # 2-byte chars: octet, not char, count
    out = _run(spark, [t])
    assert out[0]["raw_len"] == len(t.encode("utf-8"))


def test_plan_no_shuffle_one_udf(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        compress.compression_filter(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
    assert plan.count("ArrowEvalPython") == 1  # the zlib kernel, once
