"""HITS hubs/authorities: exact parity against an independent Python
integer reference AND the DuckDB twin, structural invariants, plan shape."""

import duckdb
import pytest

from mycelium_spark.operators import linkgraph

# two hub pages each linking the same three authorities, plus a chain
# tail (12 -> 20) so one authority is also a (weak) hub
EDGES = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (2, 12), (12, 20)]
S = linkgraph.HITS_SCALE


def _py_hits(edges, iters=5):
    """Independent reference: the documented L1-normalized integer HITS."""
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    h = {v: S // len(nodes) for v in nodes}
    a = None

    def norm(x):
        tot = sum(x.values())
        return {v: (r * S) // tot if tot else 0 for v, r in x.items()}

    for _ in range(iters):
        a = norm({v: sum(h[u] for u, w in edges if w == v) for v in nodes})
        h = norm({u: sum(a[w] for v, w in edges if v == u) for u in nodes})
    return {v: (h[v] / S, a[v] / S) for v in nodes}


@pytest.fixture(scope="module")
def result(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    return {
        r["node"]: (r["hub"], r["authority"])
        for r in linkgraph.hits(e).collect()
    }


def test_matches_python_reference(result):
    assert result == _py_hits(EDGES)


def test_matches_duckdb_twin(result):
    values = " UNION ALL ".join(
        f"SELECT {u} AS src, {v} AS dst" for u, v in EDGES
    )
    rows = duckdb.sql(linkgraph.hits_sql(values)).fetchall()
    assert {n: (h, a) for n, h, a in rows} == result


def test_structural_invariants(result):
    # pure hubs have zero authority; pure authorities zero hub
    assert result[1][1] == 0.0 and result[2][1] == 0.0
    assert result[10][0] == 0.0 and result[20][0] == 0.0
    # the two symmetric hubs tie exactly (integer arithmetic, same rows)
    assert result[1] == result[2]
    # symmetric authorities 10/11 tie; 12 also collects 12->20 hub mass
    assert result[10] == result[11]
    assert result[12][0] > 0.0  # weak hub via the chain tail
    # hubs out-score the weak hub; authorities out-score everything else
    assert result[1][0] > result[12][0]
    assert result[10][1] > result[20][1]


def test_iters_validated(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        linkgraph.hits(e, iters=0)


def test_plan_no_nested_loop_no_python(spark):
    e = spark.createDataFrame(EDGES, "src long, dst long")
    plan = (
        linkgraph.hits(e, iters=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # totals equi-join on _k
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
