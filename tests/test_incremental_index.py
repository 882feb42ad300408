"""Incremental index maintenance: equality with a full rebuild, and
proof that unchanged documents are carried, not re-tokenized."""

from mycelium_spark.operators import index


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_full_rebuild(spark):
    old = _docs(
        spark,
        [(1, "alpha beta"), (2, "beta gamma"), (3, "gone words"), (4, "stable")],
    )
    new = _docs(
        spark,
        [(1, "alpha beta"), (2, "beta DELTA beta"), (4, "stable"), (5, "brand new")],
    )
    maintained = index.incremental_doc_terms(index.doc_terms(old), old, new)
    rebuilt = index.doc_terms(new)
    assert sorted(map(tuple, maintained.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_unchanged_docs_are_carried_not_recomputed(spark):
    old = _docs(spark, [(1, "alpha"), (2, "beta")])
    new = _docs(spark, [(1, "alpha"), (2, "beta CHANGED")])
    # plant a deliberately wrong row for UNCHANGED doc 1: if maintenance
    # re-tokenized it, the planted row would be replaced
    planted = spark.createDataFrame(
        [(1, "PLANTED", 99), (2, "beta", 1)], "doc_id long, term string, tf long"
    )
    out = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in index.incremental_doc_terms(planted, old, new).collect()
    }
    assert out[(1, "PLANTED")] == 99  # carried verbatim
    assert (2, "beta") in out and (2, "CHANGED") in out  # re-tokenized


def test_gone_and_added(spark):
    old = _docs(spark, [(1, "dying words")])
    new = _docs(spark, [(2, "fresh words")])
    got = sorted(
        map(tuple, index.incremental_doc_terms(index.doc_terms(old), old, new).collect())
    )
    assert got == sorted(map(tuple, index.doc_terms(new).collect()))
    assert all(d == 2 for d, _, _ in got)


def test_stats_view_equivalence(spark):
    docs = _docs(spark, [(1, "a b a"), (2, "b c")])
    direct = sorted(map(tuple, index.postings_stats(docs).collect()))
    via_terms = sorted(
        map(tuple, index.stats_from_terms(index.doc_terms(docs)).collect())
    )
    assert direct == via_terms
