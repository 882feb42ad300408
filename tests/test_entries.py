"""Driver-gate rehearsal: run every __spark_entry__ query against its DuckDB
oracle at sf0.01 (exactly what CORRECTNESS_r{N}.json will record)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


QUERY_NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_against_oracle(spark, con, name, request):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        assert sdf.count() >= 0  # rows-only check
        return
    cols = sorted(sdf.columns)
    a = sorted(tuple(_canon(r[c]) for c in cols) for r in sdf.collect())
    rel = con.sql(oracles[name])
    duck_cols = rel.columns
    assert sorted(duck_cols) == cols, f"column mismatch: spark={cols} duck={sorted(duck_cols)}"
    idx = [duck_cols.index(c) for c in cols]
    b = sorted(tuple(_canon(row[i]) for i in idx) for row in rel.fetchall())
    assert len(a) == len(b), f"{name}: rows spark={len(a)} duck={len(b)}"
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    assert not diffs, f"{name}: {len(diffs)} value diffs, first: {diffs[0]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["doc_id", "title", "ws_tokens", "bpe_tokens", "text_len"]
