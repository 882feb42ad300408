"""Registered-domain extraction: the publicsuffix.org test vectors that
our embedded rule subset covers, DuckDB twin parity, plan shape."""

import duckdb
import pytest

from mycelium_spark.operators import domains

# (host, public_suffix, registered_domain) — from the PSL spec's
# checkPublicSuffix examples for these rule kinds
VECTORS = [
    ("example.com", "com", "example.com"),
    ("www.example.com", "com", "example.com"),
    ("com", "com", None),
    ("b.example.co.uk", "co.uk", "example.co.uk"),
    ("co.uk", "co.uk", None),
    ("a.b.github.io", "github.io", "b.github.io"),
    ("foo.bar.blogspot.com", "blogspot.com", "bar.blogspot.com"),
    # exception rule !www.ck
    ("www.ck", "ck", "www.ck"),
    ("sub.www.ck", "ck", "www.ck"),
    # wildcard rule *.ck
    ("this.that.ck", "that.ck", "this.that.ck"),
    ("that.ck", "that.ck", None),
    # no matching rule -> default '*' (bare TLD)
    ("example.nosuchtld", "nosuchtld", "example.nosuchtld"),
    ("nosuchtld", "nosuchtld", None),
    # case folding
    ("WwW.ExAmPle.COM", "com", "example.com"),
    ("x.S3.amazonaws.com", "s3.amazonaws.com", "x.s3.amazonaws.com"),
    ("s3.amazonaws.com", "s3.amazonaws.com", None),
]


@pytest.fixture(scope="module")
def result(spark):
    h = spark.createDataFrame([(v[0],) for v in VECTORS], "host string")
    return {
        r["host"]: (r["public_suffix"], r["registered_domain"])
        for r in domains.registered_domain(h).collect()
    }


def test_psl_vectors(result):
    for host, ps, rd in VECTORS:
        assert result[host.lower()] == (ps, rd), host


def test_duckdb_twin_parity(result):
    values = " UNION ALL ".join(f"SELECT '{v[0]}' AS host" for v in VECTORS)
    rows = duckdb.sql(domains.registered_domain_sql(values)).fetchall()
    assert {h: (ps, rd) for h, ps, rd in rows} == result


def test_duplicate_hosts_keep_row_count(spark):
    h = spark.createDataFrame(
        [("example.com",), ("example.com",), ("www.ck",)], "host string"
    )
    assert domains.registered_domain(h).count() == 3


def test_cap_per_domain(spark):
    rows = [(i, "www.example.com" if i < 8 else f"u{i}.github.io")
            for i in range(12)]
    d = spark.createDataFrame(rows, "doc_id long, host string")
    out = domains.cap_per_domain(d, cap=3).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["registered_domain"], []).append(r)
    # 8 docs in example.com -> exactly 3 kept; singleton domains all keep
    ex = by_dom["example.com"]
    assert len(ex) == 8 and sum(r["keep"] for r in ex) == 3
    assert sorted(r["dom_rank"] for r in ex) == list(range(1, 9))
    for i in range(8, 12):
        dom = f"u{i}.github.io"
        assert [r["keep"] for r in by_dom[dom]] == [True]
    # selection is the deterministic md5 order, not insertion order
    kept = sorted(r["doc_id"] for r in ex if r["keep"])
    import hashlib
    expect = sorted(
        sorted(range(8), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())[:3]
    )
    assert kept == expect


def test_cap_duckdb_twin(spark):
    rows = [(i, "www.example.com" if i < 8 else "that.ck")
            for i in range(12)]
    d = spark.createDataFrame(rows, "doc_id long, host string")
    got = sorted(
        (r["doc_id"], r["registered_domain"], r["dom_rank"], r["keep"])
        for r in domains.cap_per_domain(d, cap=3).collect()
    )
    values = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{h}' AS host" for i, h in rows
    )
    duck = sorted(duckdb.sql(domains.cap_per_domain_sql(values, cap=3)).fetchall())
    assert duck == got


def test_plan_broadcasts_rules_no_python(spark):
    h = spark.createDataFrame([(v[0],) for v in VECTORS], "host string")
    plan = (
        domains.registered_domain(h)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # rule table never shuffles hosts
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
