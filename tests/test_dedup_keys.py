"""Tracking-param stripping / URL dedup keys: branch semantics, the
Spark↔DuckDB dialect pair, and the no-Python plan pin."""

import duckdb
import pytest

from mycelium_spark.operators import canonical

CASES = [
    # (url, expected key)
    ("http://a.example/p?utm_source=x&b=2&a=1#frag", "http://a.example/p?a=1&b=2"),
    ("http://a.example/p?a=1&b=2", "http://a.example/p?a=1&b=2"),
    ("http://a.example/p?b=2&a=1", "http://a.example/p?a=1&b=2"),
    ("http://a.example/p?fbclid=z", "http://a.example/p"),
    ("http://a.example/p?UTM_SOURCE=x", "http://a.example/p"),  # ci key
    ("http://a.example/p", "http://a.example/p"),
    ("http://a.example/p#only-frag", "http://a.example/p"),
    ("http://a.example/p?z&a=1&", "http://a.example/p?a=1&z"),
    ("http://a.example/p?gclid=1&msclkid=2&mc_cid=3", "http://a.example/p"),
    # '=' inside a VALUE is not a key boundary for the kept param
    ("http://a.example/p?next=/x?y=1", "http://a.example/p?next=/x?y=1"),
]


def test_spark_expression(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = {r["url"]: r["dedup_key"]
           for r in canonical.url_dedup_key(df).collect()}
    for url, want in CASES:
        assert got[url] == want, url


def test_duckdb_dialect_matches():
    values = " UNION ALL ".join(f"SELECT '{u}' AS url" for u, _ in CASES)
    rows = duckdb.sql(
        f"SELECT url, {canonical.dedup_key_expr('url', 'duckdb')} AS k "
        f"FROM ( {values} )"
    ).fetchall()
    assert dict(rows) == {u: k for u, k in CASES}


def test_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    plan = (
        canonical.url_dedup_key(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # no shuffle: per-row expression only
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
