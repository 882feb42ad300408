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


# ---------------------------------------------------------- trustrank


def _duck_trust(pairs, seeds, iters=5, damping=0.85):
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", pairs)
    con.execute("CREATE TABLE s (node BIGINT)")
    con.executemany("INSERT INTO s VALUES (?)", [(x,) for x in seeds])
    return sorted(
        tuple(r)
        for r in con.sql(
            linkgraph.trustrank_sql(
                "SELECT src, dst FROM e", "SELECT node FROM s", iters, damping
            )
        ).fetchall()
    )


def _trust(spark, pairs, seeds):
    sdf = spark.createDataFrame([(x,) for x in seeds], "node long")
    return {
        r["node"]: r["trust"]
        for r in linkgraph.trustrank(_edges(spark, pairs), sdf).collect()
    }


def test_trustrank_matches_duckdb_twin(spark):
    seeds = [0, 3]
    sdf = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = sorted(
        tuple(r) for r in linkgraph.trustrank(_edges(spark, _GRAPH), sdf).collect()
    )
    assert got == _duck_trust(_GRAPH, seeds)


def test_trust_flows_from_seeds_only(spark):
    # chain 0 -> 1 -> 2 and isolated pair 3 -> 4; seed {0}: the isolated
    # component gets exactly zero trust, and trust decays along the chain
    t = _trust(spark, [(0, 1), (1, 2), (3, 4)], [0])
    assert t[3] == 0.0 and t[4] == 0.0
    assert t[0] > t[1] > t[2] > 0


def test_unknown_seed_contributes_nothing(spark):
    # a seed not present in the graph must not receive teleport mass
    # (it is not a node), and no trust appears anywhere
    t = _trust(spark, [(1, 2)], [99])
    assert set(t) == {1, 2} and all(v == 0.0 for v in t.values())


def test_farm_starves_under_trustrank(spark):
    # seeds feed an honest chain; a reciprocal farm pair is reachable
    # only from itself -> pagerank rewards it, trustrank zeroes it
    pairs = [(0, 1), (1, 0), (10, 11), (11, 10), (0, 10)]
    # farm = {10, 11} reachable from seed 0 here, so give them trust via
    # the 0->10 edge but compare against the UNREACHABLE farm {20, 21}
    pairs += [(20, 21), (21, 20)]
    t = _trust(spark, pairs, [0])
    assert t[20] == 0.0 and t[21] == 0.0
    assert t[10] > 0  # reachable farm still earns something via 0->10
    pr = {r["node"]: r["rank"] for r in linkgraph.pagerank(_edges(spark, pairs)).collect()}
    assert pr[20] > 0  # pagerank cannot tell the difference
