"""PageRank: DuckDB-twin equivalence, analytic fixed points (cycle,
star), dangling-mass leak semantics, and partitioning invariance."""

import duckdb
import pytest

from mycelium_spark.operators import linkgraph


def _edges(spark, pairs, parts=None):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.repartition(parts) if parts else df


def _duck(pairs, iters=5, damping=0.85):
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", pairs)
    return sorted(
        tuple(r)
        for r in con.sql(
            linkgraph.pagerank_sql("SELECT src, dst FROM e", iters, damping)
        ).fetchall()
    )


_GRAPH = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 0), (4, 4), (4, 0),
    (5, 1), (2, 5), (1, 0), (0, 1),  # duplicate edge: must not weight
]


def test_matches_duckdb_twin(spark):
    got = sorted(tuple(r) for r in linkgraph.pagerank(_edges(spark, _GRAPH)).collect())
    assert got == _duck(_GRAPH)


def test_cycle_is_uniform(spark):
    # 4-cycle: rank stays exactly 1/N every iteration
    cyc = [(i, (i + 1) % 4) for i in range(4)]
    out = linkgraph.pagerank(_edges(spark, cyc)).collect()
    assert len(out) == 4
    assert all(abs(r["rank"] - 0.25) < 1e-9 for r in out)


def test_star_center_dominates(spark):
    # leaves all point at the hub; hub points back at one leaf
    star = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    ranks = {r["node"]: r["rank"] for r in linkgraph.pagerank(_edges(spark, star)).collect()}
    assert ranks[0] == max(ranks.values())
    assert ranks[1] > ranks[2]  # the hub-endorsed leaf beats the others
    assert ranks[2] == ranks[3] == ranks[4] == ranks[5]


def test_dangling_mass_leaks(spark):
    # node 2 has no out-edges: its rank leaks, total < 1 (documented)
    g = [(0, 1), (1, 2), (0, 2)]
    out = linkgraph.pagerank(_edges(spark, g)).collect()
    total = sum(r["rank"] for r in out)
    assert total < 0.999
    assert _duck(g) == sorted(tuple(r) for r in out)  # leak semantics agree


def test_no_dangling_sums_to_one(spark):
    cyc = [(i, (i + 1) % 7) for i in range(7)] + [(3, 0), (5, 2)]
    out = linkgraph.pagerank(_edges(spark, cyc)).collect()
    assert sum(r["rank"] for r in out) == pytest.approx(1.0, abs=1e-8)


def test_partitioning_invariance(spark):
    a = sorted(tuple(r) for r in linkgraph.pagerank(_edges(spark, _GRAPH)).collect())
    b = sorted(
        tuple(r) for r in linkgraph.pagerank(_edges(spark, _GRAPH, parts=7)).collect()
    )
    assert a == b


def test_plan_has_no_nested_loops(spark):
    df = linkgraph.pagerank(_edges(spark, _GRAPH), iters=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
