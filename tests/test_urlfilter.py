"""URL filter: subdomain-suffix blocklist semantics, keyword weights,
DuckDB-twin equivalence, broadcast plan pin."""

import duckdb

from mycelium_spark.operators import urlfilter

_URLS = [
    (0, "http://good.example/page.html"),
    (1, "http://bad.example/page.html"),           # exact block
    (2, "http://ads.bad.example/x"),               # subdomain block
    (3, "http://notbad.example/x"),                # suffix is LABEL-wise, not substring
    (4, "http://good.example/casino/x"),           # kw 3 → drop
    (5, "http://good.example/poker.html"),         # kw 2 → keep (< 3)
    (6, "http://good.example/poker-pills.html"),   # kw 4 → drop
    (7, "https://UPPER.Bad.Example:8080/x"),       # case/port insensitive block
    (8, "http://example/x"),                       # single-label host
]
_BLOCK = ["bad.example"]


def _spark_out(spark, urls=_URLS, block=_BLOCK, **kw):
    u = spark.createDataFrame(urls, "doc_id long, url string")
    b = spark.createDataFrame([(d,) for d in block], "domain string")
    return {r["doc_id"]: r.asDict() for r in urlfilter.url_filter(u, b, **kw).collect()}


def _duck_out(urls=_URLS, block=_BLOCK, **kw):
    con = duckdb.connect()
    con.execute("CREATE TABLE uu (doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO uu VALUES (?, ?)", urls)
    block_sql = "SELECT * FROM (VALUES " + ", ".join(f"('{d}')" for d in block) + ") AS t(domain)"
    sql = urlfilter.url_filter_sql("SELECT doc_id, url FROM uu", block_sql, **kw)
    cols = [d[0] for d in con.sql(sql).description]
    return {r[0]: dict(zip(cols, r)) for r in con.sql(sql).fetchall()}


def test_blocklist_semantics(spark):
    out = _spark_out(spark)
    assert not out[0]["blocked_domain"]
    assert out[1]["blocked_domain"]      # exact
    assert out[2]["blocked_domain"]      # subdomain
    assert not out[3]["blocked_domain"]  # notbad.example: label boundary holds
    assert out[7]["blocked_domain"]      # lowercased, port stripped
    assert out[7]["host"] == "upper.bad.example"
    assert not out[8]["blocked_domain"]


def test_keyword_weights_and_gate(spark):
    out = _spark_out(spark)
    assert out[4]["kw_score"] == 3 and not out[4]["keep"]
    assert out[5]["kw_score"] == 2 and out[5]["keep"]
    assert out[6]["kw_score"] == 4 and not out[6]["keep"]
    assert out[0]["kw_score"] == 0 and out[0]["keep"]
    assert not out[1]["keep"]  # blocked wins regardless of score


def test_matches_duckdb_twin(spark):
    assert _spark_out(spark) == _duck_out()


def test_label_depth_cap(spark):
    deep = [(0, "http://" + ".".join(f"l{i}" for i in range(12)) + ".bad.example/x")]
    # 14 labels, cap 8: the suffix list never reaches 'bad.example'
    got = _spark_out(spark, urls=deep)
    want = _duck_out(urls=deep)
    assert got == want
    assert not got[0]["blocked_domain"]


def test_plan_broadcasts_blocklist(spark):
    u = spark.createDataFrame(_URLS, "doc_id long, url string")
    b = spark.createDataFrame([(d,) for d in _BLOCK], "domain string")
    plan = (
        urlfilter.url_filter(u, b)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
