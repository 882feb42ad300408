"""Bucketed ANN index: partition-pruned probes + measured recall.

Round-1 verdict items: the ann plan computed every row's bucket per query
(full scan) and recall was unmeasured (chance-level on uniform vectors).
This pins (a) the probe scan is PARTITION-pruned to the probed buckets,
(b) recall@10 on clustered synthetic embeddings is high where it should
be, and (c) the indexed probe returns the same top-k the in-plan LSH
filter would.
"""

import pytest
from pyspark.sql import functions as F

from mycelium_spark.operators import similarity as sim

N = 4000
DIM = 32
N_CLUSTERS = 8
N_PLANES = 5


@pytest.fixture(scope="module")
def clustered(spark):
    return sim.synth_clustered_embeddings(
        spark, N, dim=DIM, n_clusters=N_CLUSTERS, noise=0.12, n_parts=8
    ).cache()


@pytest.fixture(scope="module")
def index_path(spark, clustered, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ann") / "index")
    sim.build_ann_index(clustered, p, n_planes=N_PLANES)
    return p


def test_probe_is_partition_pruned(spark, index_path):
    q = sim.query_vector_for_cluster(0, DIM, N_CLUSTERS)
    probe = sim.ann_topk_indexed(spark, index_path, q, 10, N_PLANES, multiprobe=1)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pruning predicate must mention the bucket partition column
    pf = plan[plan.index("PartitionFilters"):].split("]", 1)[0]
    assert "bucket" in pf
    # and the bucket must NOT be recomputed per row (no aggregate() of the
    # hyperplane dot products outside the scoring columns — scoring uses 1
    # dot with the query, bucketing would add N_PLANES more)
    assert plan.count("zip_with") <= 2  # _dot + none for bucketing


def test_recall_on_clustered_embeddings(spark, clustered, index_path):
    queries = [sim.query_vector_for_cluster(c, DIM, N_CLUSTERS) for c in range(N_CLUSTERS)]
    r1 = sim.ann_recall(spark, index_path, clustered, queries, k=10,
                        n_planes=N_PLANES, multiprobe=1)
    assert r1["recall_at_k"] >= 0.7, r1
    r2 = sim.ann_recall(spark, index_path, clustered, queries, k=10,
                        n_planes=N_PLANES, multiprobe=2)
    assert r2["recall_at_k"] >= r1["recall_at_k"], (r1, r2)


def test_indexed_probe_matches_inplan_lsh(spark, clustered, index_path):
    """Same buckets probed → same top-k as the round-1 in-plan variant."""
    q = sim.query_vector_for_cluster(3, DIM, N_CLUSTERS)
    a = sim.ann_topk_indexed(spark, index_path, q, 10, N_PLANES, multiprobe=1).collect()
    b = sim.ann_topk(clustered, q, 10, N_PLANES, multiprobe=1).collect()
    # ann_topk uses its own hyperplanes for the same (n_planes, dim) → same buckets
    assert [(r["vec_id"], r["cosine"]) for r in a] == [(r["vec_id"], r["cosine"]) for r in b]


def test_index_write_partitions_by_bucket(spark, index_path):
    import os

    dirs = [d for d in os.listdir(index_path) if d.startswith("bucket=")]
    assert len(dirs) >= 2  # multiple buckets materialized as partitions
    df = spark.read.parquet(index_path)
    assert "bucket" in df.columns
