"""CCNet line-level dedup: corpus-order-first survival, normalization
collisions, blank-line bypass, doc-drops-out, partitioning invariance."""

from mycelium_spark.operators import linededup


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in linededup.dedup_lines(df).collect()}


def test_first_occurrence_survives(spark):
    out = _run(spark, [(1, "banner\nalpha"), (2, "banner\nbeta"), (3, "banner\ngamma")])
    assert out[1]["clean_text"] == "banner\nalpha" and out[1]["n_removed"] == 0
    assert out[2]["clean_text"] == "beta" and out[2]["n_removed"] == 1
    assert out[3]["clean_text"] == "gamma"


def test_first_is_position_order_within_doc(spark):
    # same line twice in ONE doc: pos 0 survives, pos 2 drops
    out = _run(spark, [(1, "x\ny\nx")])
    assert out[1]["clean_text"] == "x\ny" and out[1]["n_removed"] == 1


def test_normalization_collides_case_and_indent(spark):
    out = _run(spark, [(1, "Accept Cookies"), (2, "  ACCEPT COOKIES  \nown")])
    assert out[1]["clean_text"] == "Accept Cookies"
    assert out[2]["clean_text"] == "own" and out[2]["n_removed"] == 1


def test_blank_lines_bypass_dedup(spark):
    out = _run(spark, [(1, "a\n\nb"), (2, "c\n\nd")])
    assert out[1]["clean_text"] == "a\n\nb"
    assert out[2]["clean_text"] == "c\n\nd"  # blank kept in BOTH docs


def test_fully_duplicated_doc_drops_out(spark):
    out = _run(spark, [(1, "p\nq"), (2, "p\nq")])
    assert 1 in out and 2 not in out


def test_partitioning_invariance(spark):
    rows = [(i, "banner\nu%d\nv%d" % (i, i)) for i in range(40)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, linededup.dedup_lines(df1).collect()))
    b = sorted(map(tuple, linededup.dedup_lines(df1.repartition(13)).collect()))
    assert a == b
    assert a[0][3].startswith("banner")  # doc 0 keeps the banner


def test_plan_is_groupby_join_not_window(spark):
    # the skew-safety claim: no Window over the line-hash key
    df = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = linededup.dedup_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
