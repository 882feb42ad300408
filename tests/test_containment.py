"""Asymmetric containment dedup: direction semantics, the
aggregator-vs-Jaccard motivating case, DuckDB twin parity."""

import duckdb
import pytest

from mycelium_spark.operators import dedup

SHORT = "alpha beta gamma delta epsilon"
LONG = (
    "intro words here first " + SHORT
    + " and then a very long tail of unrelated editorial content "
    "continues for many more words padding the aggregator document"
)

DOCS = [
    (1, SHORT),                 # fully contained in 2
    (2, LONG),                  # the aggregator
    (3, "totally different words about nothing shared at all"),
    (4, SHORT),                 # exact dup of 1 -> both directions
]


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return sorted(
        (r["contained"], r["container"], r["containment"])
        for r in dedup.containment_pairs(docs, k=3, threshold=0.9).collect()
    )


def test_directed_semantics(result):
    d = {(a, b): c for a, b, c in result}
    # the short doc is fully contained in the aggregator, not vice versa
    assert d[(1, 2)] == 1.0
    assert (2, 1) not in d
    # exact dups contain each other
    assert d[(1, 4)] == 1.0 and d[(4, 1)] == 1.0
    # 4 is the same text as 1, so it is contained in the aggregator too
    assert d[(4, 2)] == 1.0 and (2, 4) not in d
    # unrelated doc pairs with nothing shared never appear
    assert not any(3 in (a, b) for a, b in d)


def test_aggregator_case_beats_jaccard(spark):
    # the motivating case: containment fires where Jaccard cannot
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    jac = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()
    assert not any({r["id_a"], r["id_b"]} == {1, 2} for r in jac)


def test_duckdb_twin_parity(result):
    values = " UNION ALL ".join(
        f"SELECT {i} AS doc_id, '{t}' AS text" for i, t in DOCS
    )
    rows = sorted(
        duckdb.sql(
            dedup.containment_sql(3, 0.9, source=f"( {values} )")
        ).fetchall()
    )
    assert rows == result


def test_short_docs_pair_only_when_identical(spark):
    # under k tokens the kernel emits ONE whole-doc shingle (documented
    # in shingles_expr): exact short dups pair at 1.0, others never
    docs = spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "one three")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["contained"], r["container"], r["containment"])
        for r in dedup.containment_pairs(docs, k=3, threshold=0.9).collect()
    )
    assert rows == [(1, 2, 1.0), (2, 1, 1.0)]
