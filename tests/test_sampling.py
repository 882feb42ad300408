"""Token-budget sampling: greedy-prefix semantics, two-phase vs global
window equivalence, boundary behavior, and partitioning invariance."""

import duckdb

from mycelium_spark.operators import sampling


def _docs(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(parts) if parts else df


def _texts(n):
    # doc i has i+1 tokens
    return [(i, " ".join(f"w{j}" for j in range(i + 1))) for i in range(n)]


def test_matches_duckdb_global_window(spark):
    rows = _texts(40)
    got = sorted(
        tuple(r) for r in sampling.sample_to_token_budget(_docs(spark, rows), 300).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    exp = sorted(
        tuple(r)
        for r in con.sql(sampling.sample_to_token_budget_sql(300, "d")).fetchall()
    )
    assert got == exp
    assert 0 < len(got) < 40  # both branches populated


def test_partitioning_invariance(spark):
    rows = _texts(40)
    a = sorted(tuple(r) for r in sampling.sample_to_token_budget(_docs(spark, rows), 300).collect())
    b = sorted(
        tuple(r)
        for r in sampling.sample_to_token_budget(_docs(spark, rows, parts=7), 300).collect()
    )
    assert a == b  # bit-identical under any input partitioning


def test_boundary_crossing_doc_included(spark):
    rows = _texts(10)
    out = sorted(
        sampling.sample_to_token_budget(_docs(spark, rows), 20).collect(),
        key=lambda r: r["cum_tokens"],
    )
    # the last kept row STARTS below the budget but may end past it
    last = out[-1]
    assert last["cum_tokens"] - last["n_tokens"] < 20
    # and no kept row starts at/after the budget
    assert all(r["cum_tokens"] - r["n_tokens"] < 20 for r in out)


def test_budget_larger_than_corpus_keeps_all(spark):
    rows = _texts(10)
    out = sampling.sample_to_token_budget(_docs(spark, rows), 10_000).collect()
    assert len(out) == 10
    assert max(r["cum_tokens"] for r in out) == sum(i + 1 for i in range(10))


def test_zero_budget_keeps_nothing(spark):
    assert sampling.sample_to_token_budget(_docs(spark, _texts(5)), 0).count() == 0
