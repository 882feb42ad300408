"""URL pattern mining: placeholder composition, explosion flags, and
the template-cardinality aggregation plan."""

from mycelium_spark.operators import urlpatterns


def _run(spark, urls, **kw):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return urlpatterns.url_patterns(df, **kw).collect()


def test_generalization_order(spark):
    # hex >= 8 wins over digits; shorter digit runs become N; query
    # values collapse after path placeholders
    rows = _run(
        spark,
        [
            "http://h.ex/s/deadbeef123456/p?id=42&x=abc#frag",
            "http://h.ex/item/123",
            "http://h.ex/d/2026/08/17",
        ],
    )
    pats = {r["pattern"] for r in rows}
    assert "/s/H/p?id=V&x=V" in pats
    assert "/item/N" in pats
    assert "/d/N/N/N" in pats


def test_explosion_by_count_and_share(spark):
    urls = [f"http://big.ex/item/{i}" for i in range(25)]  # >= 20: count
    urls += [f"http://big.ex/x/{c}" for c in "abcdefghij"]  # 10 statics
    # mid host: 9 of 12 URLs in one template -> share 750 >= 500
    urls += [f"http://mid.ex/p/{i}" for i in range(9)]
    urls += [f"http://mid.ex/{w}" for w in ("about", "faq", "jobs")]
    # tiny host: dominance without mass (2 of 3 < min_host_urls)
    urls += ["http://tiny.ex/p/1", "http://tiny.ex/p/2", "http://tiny.ex/faq"]
    out = {(r["host"], r["pattern"]): r for r in _run(spark, urls)}
    assert out[("big.ex", "/item/N")]["explosive"]
    assert out[("big.ex", "/item/N")]["n_urls"] == 25
    for c in "abcdefghij":
        assert not out[("big.ex", f"/x/{c}")]["explosive"]
    assert out[("mid.ex", "/p/N")]["explosive"]  # by share: 750
    assert out[("mid.ex", "/p/N")]["share_milli"] == 750
    assert not out[("mid.ex", "/about")]["explosive"]
    assert not out[("tiny.ex", "/p/N")]["explosive"]  # no mass, no flag


def test_distinct_urls_not_rows(spark):
    rows = _run(spark, ["http://h.ex/item/1"] * 30 + ["http://h.ex/item/2"])
    (g,) = [r for r in rows if r["pattern"] == "/item/N"]
    assert g["n_urls"] == 2 and not g["explosive"]


def test_example_is_min_url(spark):
    rows = _run(spark, ["http://h.ex/item/9", "http://h.ex/item/10"])
    (g,) = rows
    assert g["example"] == "http://h.ex/item/10"  # lexical min


def test_plan_no_window_no_python(spark):
    df = spark.createDataFrame([("http://h.ex/p",)], "url string")
    plan = (
        urlpatterns.url_patterns(df)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "Window" not in plan
    assert "Cartesian" not in plan
