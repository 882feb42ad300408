"""Per-host corpus report: counts, exact means, language-mode
tie-break, dup detection, and the digest-only aggregation plan."""

from mycelium_spark.operators import hostreport


def _run(spark, rows):
    df = spark.createDataFrame(rows, "host string, lang string, text string")
    return {r["host"]: r for r in hostreport.host_report(df).collect()}


def test_counts_and_means(spark):
    out = _run(
        spark,
        [
            ("a", "en", "one two three"),  # 13 chars, 3 tokens
            ("a", "en", "four  five"),  # 10 chars, 2 tokens (double space)
            ("b", "de", "x"),
        ],
    )
    a = out["a"]
    assert a["n_docs"] == 2 and a["total_chars"] == 23 and a["total_tokens"] == 5
    assert a["mean_chars_milli"] == 23 * 1000 // 2
    assert out["b"]["n_docs"] == 1


def test_lang_mode_and_tie_break(spark):
    out = _run(
        spark,
        [
            ("a", "en", "t1"), ("a", "en", "t2"), ("a", "de", "t3"),
            # host b: 1 en, 1 de -> tie breaks to the LARGER lang string
            ("b", "en", "t4"), ("b", "de", "t5"),
        ],
    )
    assert out["a"]["top_lang"] == "en" and out["a"]["top_lang_docs"] == 2
    assert out["a"]["n_langs"] == 2
    assert out["b"]["top_lang"] == "en"  # 'en' > 'de'
    assert out["b"]["top_lang_docs"] == 1


def test_dup_docs_within_host_only(spark):
    out = _run(
        spark,
        [
            ("a", "en", "same"), ("a", "en", "same"), ("a", "en", "diff"),
            ("b", "en", "same"),  # cross-host copy: not a within-host dup
        ],
    )
    assert out["a"]["dup_docs"] == 1 and out["b"]["dup_docs"] == 0


def test_plan_text_reduced_before_shuffle(spark):
    df = spark.createDataFrame(
        [("h", "en", "x" * 500)], "host string, lang string, text string"
    )
    plan = hostreport.host_report(df)._jdf.queryExecution().optimizedPlan().toString()
    # document text must not cross the aggregation: no Aggregate line
    # carries the raw text attribute
    for line in plan.splitlines():
        if "Aggregate" in line:
            assert "text#" not in line
    assert "BatchEvalPython" not in plan and "Cartesian" not in plan
