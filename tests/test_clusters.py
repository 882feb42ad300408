"""Dup-cluster resolution: pairs → connected components → survivors."""

import pytest
from pyspark.sql import functions as F

from mycelium_spark.operators import clusters, dedup


def _pairs(spark, edges):
    return spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )


def _resolve(spark, edges):
    out = clusters.connected_components(_pairs(spark, edges)).collect()
    return {r.doc_id: (r.cluster_id, r.keep) for r in out}


def test_two_components_and_survivors(spark):
    got = _resolve(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        10: (10, True), 11: (10, False),
    }


def test_transitive_chain_without_direct_edge(spark):
    # A~B and B~C near-dups, A-C below threshold: still ONE cluster
    got = _resolve(spark, [(5, 9), (9, 14)])
    assert {cid for cid, _ in got.values()} == {5}
    assert [d for d, (_, k) in got.items() if k] == [5]


def test_long_path_converges_in_log_iterations(spark):
    # pathological template-chain: path graph of 33 nodes (diameter 32);
    # pointer jumping must converge well under max_iter=10 (log2(32)=5)
    edges = [(i, i + 1) for i in range(32)]
    out = clusters.connected_components(_pairs(spark, edges), max_iter=10).collect()
    assert len(out) == 33
    assert all(r.cluster_id == 0 for r in out)
    assert sum(r.keep for r in out) == 1


def test_edge_order_and_direction_irrelevant(spark):
    a = _resolve(spark, [(2, 7), (3, 7), (3, 4)])
    b = _resolve(spark, [(4, 3), (7, 3), (7, 2)])
    assert a == b == {2: (2, True), 3: (2, False), 4: (2, False), 7: (2, False)}


def test_dedup_corpus_drops_losers_keeps_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    cl = clusters.connected_components(_pairs(spark, [(1, 2), (5, 6)]))
    kept = sorted(
        r.doc_id for r in clusters.dedup_corpus(docs, cl).select("doc_id").collect()
    )
    # 2 and 6 dropped; singletons 0,3,4,7 untouched
    assert kept == [0, 1, 3, 4, 5, 7]


def test_end_to_end_minhash_to_corpus(spark):
    """Near-dup texts resolve to one survivor; the distinct doc stays."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),           # near-dup of 1
            (3, base.replace("dog", "cat")),  # near-dup of 1 and 2
            (4, "completely different text about spark shuffles and parquet files"),
        ],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_dedup_pairs(docs, 16, 8, 3, 0.5)
    cl = clusters.connected_components(pairs)
    kept = sorted(r.doc_id for r in clusters.dedup_corpus(docs, cl).collect())
    assert kept == [1, 4]


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError):
        # max_iter=0 exhausts the loop without reaching a fixpoint check
        clusters.connected_components(_pairs(spark, [(1, 2)]), max_iter=0)


def test_empty_pairs_yield_empty_resolution(spark):
    out = clusters.connected_components(
        spark.createDataFrame([], "id_a long, id_b long")
    )
    assert out.count() == 0
    assert out.columns == ["doc_id", "cluster_id", "keep"]


def test_incremental_matches_full_recompute(spark):
    prior = clusters.connected_components(_pairs(spark, [(1, 2), (3, 4), (7, 8)]))
    # new batch: merges {1,2}+{3,4} via (2,3); brand-new pair (10,11)
    new = _pairs(spark, [(2, 3), (10, 11)])
    inc = {
        r.doc_id: (r.cluster_id, r.keep)
        for r in clusters.connected_components_incremental(prior, new).collect()
    }
    full = _resolve(spark, [(1, 2), (3, 4), (7, 8), (2, 3), (10, 11)])
    assert inc == full
    assert inc[4] == (1, False)  # merged across the old cluster boundary
    assert inc[7] == (7, True)   # untouched old cluster survives unchanged
    assert inc[10] == (10, True)


def test_incremental_is_idempotent_with_no_new_pairs(spark):
    prior = clusters.connected_components(_pairs(spark, [(1, 2), (2, 3)]))
    again = clusters.connected_components_incremental(
        prior, _pairs(spark, [])
    )
    assert {
        (r.doc_id, r.cluster_id, r.keep) for r in again.collect()
    } == {(r.doc_id, r.cluster_id, r.keep) for r in prior.collect()}
