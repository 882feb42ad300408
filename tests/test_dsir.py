"""DSIR importance resampling: feature construction, weight direction,
deterministic Gumbel draw, and top-k selection shape."""

import math

from pyspark.sql import functions as F

from mycelium_spark.operators import dsir


def test_doc_features_unigrams_and_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, ""), (4, "x !! y")],
        "doc_id long, text string",
    )
    out = sorted(
        (r["doc_id"], r["feat"]) for r in dsir.doc_features(df).collect()
    )
    assert out == sorted(
        [(1, "a"), (1, "b"), (1, "c"), (1, "a b"), (1, "b c"),
         (2, "solo"),
         # "!!" fails ^\w+$ BEFORE bigram formation: x/y become adjacent
         (4, "x"), (4, "y"), (4, "x y")]
    )


def test_target_docs_rank_above_offtarget(spark):
    # target slice = docs full of "aa"; off-target docs full of "zz".
    # Importance ratio must favor aa-docs, and with distinct content the
    # Gumbel noise (bounded by the huge weight gap) cannot flip ranks.
    rows = [(i, ("aa " * 30).strip()) for i in range(0, 20, 2)]  # even: target
    rows += [(i, ("zz " * 30).strip()) for i in range(1, 20, 2)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dsir.dsir_sample(df, target_pred="doc_id % 2 = 0", k=10).collect()
    assert len(out) == 10
    assert all(r["doc_id"] % 2 == 0 for r in out)
    assert all(r["log_ratio"] > 0 for r in out)


def test_gumbel_noise_is_deterministic_hash(spark):
    df = spark.createDataFrame(
        [(7, "w w w"), (8, "w w w")], "doc_id long, text string"
    )
    a = {r["doc_id"]: r["sel_key"] for r in dsir.dsir_sample(df, k=2).collect()}
    b = {r["doc_id"]: r["sel_key"] for r in
         dsir.dsir_sample(df.repartition(5), k=2).collect()}
    assert a == b  # partitioning-invariant
    # identical text, different ids => same log_ratio, different noise
    assert a[7] != a[8]
    # reproduce the draw by hand for doc 7
    import hashlib

    h = int(hashlib.md5(b"dsir:7").hexdigest()[:7], 16) % 1_000_000 + 1
    u = h / 1_000_001.0
    g = round(-math.log(-math.log(u)), 6)
    row7 = [r for r in dsir.dsir_sample(df, k=2).collect() if r["doc_id"] == 7][0]
    assert abs(row7["sel_key"] - (row7["log_ratio"] + g)) < 2e-6


def test_k_caps_selection(spark):
    df = spark.createDataFrame(
        [(i, "t%d u%d" % (i, i)) for i in range(30)], "doc_id long, text string"
    )
    assert dsir.dsir_sample(df, k=5).count() == 5
    assert dsir.dsir_sample(df, k=500).count() == 30  # k > corpus: all kept


def test_topk_plan_has_no_global_window(spark):
    # selection must be TakeOrderedAndProject, not a single-reducer window
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = dsir.dsir_sample(df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
