"""Sitemap ingestion: directive extraction, urlset field parsing,
index expansion (one spec level), and the all-JVM plan shape."""

from pyspark.sql import functions as F

from mycelium_spark.sources import sitemap

_URLSET = (
    "<?xml version=\"1.0\"?>\n<urlset>\n"
    "<url><loc> http://h.test/a.html </loc>"
    "<lastmod>2026-08-17T10:00:00Z</lastmod>"
    "<changefreq>Daily</changefreq><priority>0.85</priority></url>\n"
    "<url><loc>http://h.test/b.html</loc><lastmod>soon</lastmod></url>\n"
    "<url><loc>http://h.test/c.html</loc><priority>1.0</priority></url>\n"
    "</urlset>"
)


def _seed_rows(spark, robots_rows, page_rows):
    robots = spark.createDataFrame(robots_rows, "host string, body string")
    pages = spark.createDataFrame(page_rows, "url string, body string")
    return sitemap.sitemap_seeds(robots, pages).collect()


def test_directives_case_and_dedup(spark):
    robots = spark.createDataFrame(
        [
            (
                "h.test",
                "User-agent: *\nDisallow: /x\n"
                "sitemap: http://h.test/s.xml\n"
                "  SITEMAP:   http://h.test/s.xml\n"
                "Sitemap: http://h.test/t.xml\n"
                "# sitemap: http://h.test/commented.xml\n",
            )
        ],
        "host string, body string",
    )
    got = {
        r["sitemap_url"]
        for r in sitemap.sitemap_directives(robots).collect()
    }
    # duplicate (case-varied key) collapses; the commented line is not a
    # directive (key must start the line)
    assert got == {"http://h.test/s.xml", "http://h.test/t.xml"}


def test_urlset_fields(spark):
    rows = _seed_rows(
        spark,
        [("h.test", "Sitemap: http://h.test/s.xml")],
        [("http://h.test/s.xml", _URLSET)],
    )
    by_loc = {r["loc"]: r for r in rows}
    a = by_loc["http://h.test/a.html"]  # whitespace-trimmed loc
    assert a["lastmod_day"] == "2026-08-17"  # datetime -> W3C day prefix
    assert a["changefreq"] == "daily"  # case-folded
    assert a["priority_milli"] == 850
    b = by_loc["http://h.test/b.html"]
    assert b["lastmod_day"] == ""  # non-W3C lastmod dropped
    assert b["changefreq"] == "" and b["priority_milli"] == -1
    assert by_loc["http://h.test/c.html"]["priority_milli"] == 1000
    assert all(r["host"] == "h.test" for r in rows)


def test_index_expansion_and_dead_children(spark):
    idx = (
        "<sitemapindex>"
        "<sitemap><loc>http://h.test/p1.xml</loc></sitemap>"
        "<sitemap><loc> http://h.test/p2.xml </loc></sitemap>"
        "<sitemap><loc>http://h.test/gone.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    p1 = "<urlset><url><loc>http://h.test/1.html</loc></url></urlset>"
    p2 = "<urlset><url><loc>http://h.test/2.html</loc></url></urlset>"
    rows = _seed_rows(
        spark,
        [("h.test", "Sitemap: http://h.test/idx.xml")],
        [
            ("http://h.test/idx.xml", idx),
            ("http://h.test/p1.xml", p1),
            ("http://h.test/p2.xml", p2),  # via whitespace-trimmed loc
        ],
    )
    assert {r["loc"] for r in rows} == {
        "http://h.test/1.html",
        "http://h.test/2.html",
    }
    assert {r["sitemap_url"] for r in rows} == {
        "http://h.test/p1.xml",
        "http://h.test/p2.xml",
    }


def test_index_nesting_stops_at_spec_depth(spark):
    # an index listing another index: the child IS matched against the
    # pages table, but only its <urlset> face parses — protocol forbids
    # nested indexes, so level-1 children never expand further
    outer = (
        "<sitemapindex><sitemap><loc>http://h.test/inner.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    inner = (
        "<sitemapindex><sitemap><loc>http://h.test/leaf.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    leaf = "<urlset><url><loc>http://h.test/x.html</loc></url></urlset>"
    rows = _seed_rows(
        spark,
        [("h.test", "Sitemap: http://h.test/outer.xml")],
        [
            ("http://h.test/outer.xml", outer),
            ("http://h.test/inner.xml", inner),
            ("http://h.test/leaf.xml", leaf),
        ],
    )
    assert rows == []


def test_unadvertised_and_missing_sitemaps_ignored(spark):
    rows = _seed_rows(
        spark,
        [("h.test", "Sitemap: http://h.test/missing.xml")],
        [("http://h.test/unadvertised.xml", _URLSET)],
    )
    assert rows == []


def test_plan_all_jvm_no_cartesian(spark):
    robots = spark.createDataFrame(
        [("h.test", "Sitemap: http://h.test/s.xml")], "host string, body string"
    )
    pages = spark.createDataFrame(
        [("http://h.test/s.xml", _URLSET)], "url string, body string"
    )
    plan = (
        sitemap.sitemap_seeds(robots, pages)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan
