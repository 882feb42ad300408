"""rel=canonical extraction and dedup: href syntaxes, resolution
forms, survivor election, and the no-window plan shape."""

from mycelium_spark.operators import canonical


def _links(spark, rows):
    df = spark.createDataFrame(rows, "url string, body string")
    return {r["url"]: r["canonical"] for r in canonical.canonical_links(df).collect()}


def test_href_syntaxes_and_resolution(spark):
    out = _links(
        spark,
        [
            ("http://h/p1", '<link rel="canonical" href="http://h/c">'),
            ("http://h/p2", "<link href='/c' rel='canonical'>"),  # reversed order
            ("https://h/p3", "<LINK REL=CANONICAL HREF=//h/c>"),  # unquoted, upper
            ("http://h/p4", '<link rel="canonical" href="x.html">'),  # unresolvable
            ("http://h/p5", "<p>no tag</p>"),
            ("http://h/p6", '<link rel="stylesheet" href="/s.css">'),  # wrong rel
            (
                "http://h/p7",  # first canonical tag wins
                '<link rel="canonical" href="http://h/first">'
                '<link rel="canonical" href="http://h/second">',
            ),
        ],
    )
    assert out["http://h/p1"] == "http://h/c"
    assert out["http://h/p2"] == "http://h/c"  # root-relative + scheme/host
    assert out["https://h/p3"] == "https://h/c"  # protocol-relative keeps https
    assert out["http://h/p4"] == ""
    assert out["http://h/p5"] == ""
    assert out["http://h/p6"] == ""
    assert out["http://h/p7"] == "http://h/first"


def test_dedup_survivor_election(spark):
    tag = '<link rel="canonical" href="http://h/a">'
    rows = [
        ("http://h/a", tag),  # designated target, in corpus
        ("http://h/a?utm=1", tag),
        ("http://h/a?page=2", tag),
        # group whose target is NOT in the corpus: min url survives
        ("http://h/b?x=1", '<link rel="canonical" href="http://h/b">'),
        ("http://h/b?y=2", '<link rel="canonical" href="http://h/b">'),
        ("http://h/solo", "<p>nothing</p>"),
    ]
    df = spark.createDataFrame(rows, "url string, body string")
    out = {r["url"]: r for r in canonical.canonical_dedup(df).collect()}
    for u in ("http://h/a", "http://h/a?utm=1", "http://h/a?page=2"):
        assert out[u]["survivor"] == "http://h/a" and out[u]["group_size"] == 3
    for u in ("http://h/b?x=1", "http://h/b?y=2"):
        assert out[u]["survivor"] == "http://h/b?x=1"  # min member
        assert out[u]["group_size"] == 2
        assert out[u]["canon_key"] == "http://h/b"
    assert out["http://h/solo"]["group_size"] == 1
    assert out["http://h/solo"]["survivor"] == "http://h/solo"


def test_plan_no_window_no_python(spark):
    df = spark.createDataFrame([("u", "b")], "url string, body string")
    plan = (
        canonical.canonical_dedup(df)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan and "Cartesian" not in plan
