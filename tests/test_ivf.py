"""IVF ANN: k-means coarse quantizer, partitioned lists, measured recall."""

import pytest
from pyspark.sql import functions as F

from mycelium_spark.operators import ivf, similarity as sim

N = 4000
DIM = 32
N_CLUSTERS = 8


@pytest.fixture(scope="module")
def clustered(spark):
    return sim.synth_clustered_embeddings(
        spark, N, dim=DIM, n_clusters=N_CLUSTERS, noise=0.12, n_parts=8
    ).cache()


@pytest.fixture(scope="module")
def index_path(spark, clustered, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ivf") / "index")
    ivf.build_ivf_index(clustered, p, n_centroids=16, sample_rows=3000)
    return p


def test_training_is_deterministic(clustered):
    a = ivf.train_centroids(clustered, 16, 3000)
    b = ivf.train_centroids(clustered, 16, 3000)
    assert (a == b).all()


def test_lists_partition_the_table(spark, index_path, clustered):
    df = spark.read.parquet(index_path)
    assert df.count() == N
    n_lists = df.select("list_id").distinct().count()
    assert 2 <= n_lists <= 16
    # every vector in exactly one list
    assert df.select("vec_id").distinct().count() == N


def test_probe_is_partition_pruned(spark, index_path):
    q = sim.query_vector_for_cluster(1, DIM, N_CLUSTERS)
    probe = ivf.ivf_topk(spark, index_path, q, 10, nprobe=2)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = plan[plan.index("PartitionFilters"):].split("]", 1)[0]
    assert "list_id" in pf


def test_recall_on_clustered_embeddings(spark, clustered, index_path):
    queries = [sim.query_vector_for_cluster(c, DIM, N_CLUSTERS) for c in range(N_CLUSTERS)]
    r1 = ivf.ivf_recall(spark, index_path, clustered, queries, k=10, nprobe=1)
    r2 = ivf.ivf_recall(spark, index_path, clustered, queries, k=10, nprobe=4)
    assert r2["recall_at_k"] >= 0.9, (r1, r2)
    assert r2["recall_at_k"] >= r1["recall_at_k"]


def test_exactness_when_probing_all_lists(spark, clustered, index_path):
    """nprobe = n_centroids scans everything → must equal brute force."""
    q = sim.query_vector_for_cluster(5, DIM, N_CLUSTERS)
    brute = [(r["vec_id"], r["cosine"]) for r in sim.cosine_topk(clustered, q, 10).collect()]
    full = [(r["vec_id"], r["cosine"]) for r in ivf.ivf_topk(spark, index_path, q, 10, nprobe=16).collect()]
    assert brute == full
