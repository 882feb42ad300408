"""jusText-style boilerplate classification: context-free rule branches,
both context promotions, DuckDB twin parity, main_content assembly."""

import duckdb
import pytest

from mycelium_spark.operators import boilerplate

GOOD = "the data of spark is fast and it scales to the web " * 5  # 255c, .58
NEARGOOD = "the pipeline of spark is scalable and it runs with grace on the web today"
SPAM = "scan column window order sort part agg value line key join merge query group"

BLOCKS = [
    # doc 0: nav / neargood / good / short / spam — promotions to good
    (0, 0, "home products pricing docs blog company careers", 47),
    (0, 1, NEARGOOD, 0),
    (0, 2, GOOD, 0),
    (0, 3, "copyright 2026 example corp", 0),
    (0, 4, SPAM, 0),
    # doc 1: no good anywhere — short/neargood demote to bad
    (1, 0, SPAM, 0),
    (1, 1, NEARGOOD, 0),
    (1, 2, "copyright 2026 example corp", 0),
    # doc 2: edge rows — linked short, empty, null text
    (2, 0, "tiny linked footer", 5),
    (2, 1, "", 0),
    (2, 2, None, 0),
]


@pytest.fixture(scope="module")
def cls(spark):
    b = spark.createDataFrame(
        BLOCKS, "doc_id long, block_id long, text string, link_chars long"
    )
    return {
        (r["doc_id"], r["block_id"]): (r["cls_cf"], r["cls"], r["keep"])
        for r in boilerplate.classify_blocks(b).collect()
    }


def test_context_free_branches(cls):
    assert cls[(0, 0)][0] == "bad"       # link density 1.0
    assert cls[(0, 1)][0] == "neargood"  # dense stopwords, len <= 200
    assert cls[(0, 2)][0] == "good"      # dense stopwords, len > 200
    assert cls[(0, 3)][0] == "short"     # < 70 chars, no links
    assert cls[(0, 4)][0] == "bad"       # no stopwords
    assert cls[(2, 0)][0] == "bad"       # short BUT linked
    assert cls[(2, 1)][0] == "bad"       # empty
    assert cls[(2, 2)][0] == "bad"       # NULL


def test_context_promotions(cls):
    # doc 0 has a good body: its neargood intro and short footer promote
    assert cls[(0, 1)][1] == "good" and cls[(0, 1)][2] is True
    assert cls[(0, 3)][1] == "good"
    # doc 1 has no good block: the same texts demote to bad
    assert cls[(1, 1)][1] == "bad" and cls[(1, 1)][2] is False
    assert cls[(1, 2)][1] == "bad"
    # solid classes never change
    assert cls[(0, 0)][1] == "bad" and cls[(0, 2)][1] == "good"


def test_duckdb_twin_parity(cls):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE blocks(doc_id BIGINT, block_id BIGINT, "
        "text VARCHAR, link_chars BIGINT)"
    )
    con.executemany("INSERT INTO blocks VALUES (?, ?, ?, ?)", BLOCKS)
    rows = con.sql(
        boilerplate.classify_blocks_sql("SELECT * FROM blocks")
    ).fetchall()
    duck = {(d, b): (cf, c, k) for b, c, cf, d, k in rows}
    assert duck == cls


def test_main_content(spark):
    b = spark.createDataFrame(
        BLOCKS, "doc_id long, block_id long, text string, link_chars long"
    )
    out = {r["doc_id"]: r["main_text"]
           for r in boilerplate.main_content(b).collect()}
    # doc 0: intro + body + footer in block order; docs 1/2 drop out
    assert list(out) == [0]
    assert out[0] == "\n".join(
        [NEARGOOD, GOOD, "copyright 2026 example corp"]
    )


def test_plan_single_shuffle_no_python(spark):
    b = spark.createDataFrame(
        BLOCKS, "doc_id long, block_id long, text string, link_chars long"
    )
    plan = (
        boilerplate.classify_blocks(b)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan, marker
    # context pass reuses ONE doc_id exchange for both neighbor windows
    assert plan.count("Exchange") == 1
