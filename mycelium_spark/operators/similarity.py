"""Similarity search over embedding columns (array<float>).

Two paths, both pure JVM expressions (higher-order functions — no Python
in the scoring loop):

* brute-force cosine top-k — the exactness baseline; a single scan with a
  map-side partial top-k (Spark's TakeOrderedAndProject), no shuffle of
  the full table;
* LSH-bucketed ANN — random-hyperplane sign buckets; the hyperplanes are
  deterministic (LCG-derived, embedded as literals in both the Spark plan
  and the DuckDB oracle), the query probes only its own bucket. At 100 TB
  the table is written bucketed-by(bucket) so a probe is a partition-pruned
  scan, not a full pass; multiprobe = visiting buckets at hamming distance
  1 from the query bucket.

Cosines are computed in double precision with a left-fold in array order
in BOTH engines and rounded to 6 dp, so the oracle comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = (1 << 31) - 1


def _lcg_floats(n: int, seed: int = 0xC0FFEE) -> list[float]:
    out = []
    state = seed
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        out.append(((state >> 16) % _MOD) / _MOD * 2.0 - 1.0)
    return out


def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (same values in the oracle)."""
    return [_lcg_floats(dim, seed=0xC0FFEE + 7919 * p) for p in range(n_planes)]


def _dot_expr(vec_col: str, lits: list[float]) -> str:
    arr = "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in lits) + ")"
    return (
        f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> CAST(x AS DOUBLE) * y),"
        f" CAST(0.0 AS DOUBLE), (s, x) -> s + x)"
    )


def _dot_sql(vec_col: str, lits: list[float]) -> str:
    arr = "[" + ", ".join(repr(x) for x in lits) + "]"
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" [CAST({vec_col}[i+1] AS DOUBLE) * ({arr})[i+1] for i in range(0, len({vec_col}))]),"
        f" (s, x) -> s + x)"
    )


def _norm_expr(vec_col: str) -> str:
    return (
        f"sqrt(aggregate({vec_col}, CAST(0.0 AS DOUBLE),"
        f" (s, x) -> s + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )


def _norm_sql(vec_col: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" [CAST(x AS DOUBLE) * CAST(x AS DOUBLE) for x in {vec_col}]), (s, x) -> s + x))"
    )


def _qnorm(query: list[float]) -> float:
    return sum(x * x for x in query) ** 0.5


def cosine_topk(
    emb: DataFrame, query: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k (ties broken by id): the exact baseline."""
    qn = _qnorm(query)
    out = (
        emb.withColumn("_dot", F.expr(_dot_expr(vec_col, query)))
        .withColumn("_n", F.expr(_norm_expr(vec_col)))
        .withColumn("cosine", F.round(F.col("_dot") / (F.col("_n") * F.lit(qn)), 6))
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
    return out


def cosine_topk_sql(query: list[float], k: int = 10) -> str:
    qn = _qnorm(query)
    return f"""
SELECT vec_id, round({_dot_sql('embedding', query)} / ({_norm_sql('embedding')} * {qn!r}), 6) AS cosine
FROM embeddings
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


def bucket_expr(vec_col: str, planes: list[list[float]]) -> str:
    terms = [
        f"(CASE WHEN {_dot_expr(vec_col, p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "CAST(" + " + ".join(terms) + " AS INT)"


def bucket_sql(vec_col: str, planes: list[list[float]]) -> str:
    terms = [
        f"(CASE WHEN {_dot_sql(vec_col, p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    return "CAST(" + " + ".join(terms) + " AS INT)"


def query_bucket(query: list[float], planes: list[list[float]]) -> int:
    b = 0
    for i, p in enumerate(planes):
        s = 0.0
        for x, y in zip(query, p):
            s += float(x) * y
        if s > 0:
            b |= 1 << i
    return b


def ann_topk(
    emb: DataFrame, query: list[float], k: int = 10, n_planes: int = 4,
    multiprobe: int = 0, vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """LSH-bucketed approximate top-k: score only the query's bucket
    (plus buckets at hamming distance <= multiprobe)."""
    dim = len(query)
    planes = hyperplanes(n_planes, dim)
    qb = query_bucket(query, planes)
    probe = {qb}
    if multiprobe >= 1:
        probe |= {qb ^ (1 << i) for i in range(n_planes)}
    qn = _qnorm(query)
    return (
        emb.withColumn("_bucket", F.expr(bucket_expr(vec_col, planes)))
        .filter(F.col("_bucket").isin(*sorted(probe)))
        .withColumn("_dot", F.expr(_dot_expr(vec_col, query)))
        .withColumn("_n", F.expr(_norm_expr(vec_col)))
        .withColumn("cosine", F.round(F.col("_dot") / (F.col("_n") * F.lit(qn)), 6))
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ann_topk_sql(query: list[float], k: int = 10, n_planes: int = 4, multiprobe: int = 0) -> str:
    planes = hyperplanes(n_planes, len(query))
    qb = query_bucket(query, planes)
    probe = {qb}
    if multiprobe >= 1:
        probe |= {qb ^ (1 << i) for i in range(n_planes)}
    qn = _qnorm(query)
    in_list = ", ".join(str(b) for b in sorted(probe))
    return f"""
SELECT vec_id, round({_dot_sql('embedding', query)} / ({_norm_sql('embedding')} * {qn!r}), 6) AS cosine
FROM embeddings
WHERE {bucket_sql('embedding', planes)} IN ({in_list})
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


def deterministic_query(dim: int = 64, seed: int = 1234) -> list[float]:
    """A fixed query vector for tests/benchmarks."""
    return [round(x, 6) for x in _lcg_floats(dim, seed)]


# ------------------------------------------------ bucketed ANN storage ----
def build_ann_index(
    emb: DataFrame, path: str, n_planes: int = 6,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> None:
    """Write the embedding table PARTITIONED BY its LSH bucket.

    A probe then reads only the probed buckets' files (partition pruning —
    the scan's PartitionFilters carry ``bucket IN (...)``), which is the
    100 TB path: probing b buckets of 2^p total scans b/2^p of the table
    instead of computing every row's bucket per query (round-1 ann_topk).
    """
    dim = len(emb.select(vec_col).head()[0])
    planes = hyperplanes(n_planes, dim)
    (
        emb.withColumn("bucket", F.expr(bucket_expr(vec_col, planes)))
        # cluster by the partition key before the write (the Iceberg
        # hash distribution-mode practice, guide §6): one writer task per
        # bucket instead of (input partitions x buckets) tiny files
        .repartition(F.col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def ann_topk_indexed(
    spark, path: str, query: list[float], k: int = 10, n_planes: int = 6,
    multiprobe: int = 1, vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Top-k over the bucket-partitioned index: partition-pruned scan of
    the probe buckets only, then exact cosine + TakeOrderedAndProject."""
    planes = hyperplanes(n_planes, len(query))
    qb = query_bucket(query, planes)
    probe = {qb}
    if multiprobe >= 1:
        probe |= {qb ^ (1 << i) for i in range(n_planes)}
    if multiprobe >= 2:
        probe |= {qb ^ (1 << i) ^ (1 << j)
                  for i in range(n_planes) for j in range(i + 1, n_planes)}
    qn = _qnorm(query)
    return (
        spark.read.parquet(path)
        .filter(F.col("bucket").isin(*sorted(probe)))
        .withColumn("_dot", F.expr(_dot_expr(vec_col, query)))
        .withColumn("_n", F.expr(_norm_expr(vec_col)))
        .withColumn("cosine", F.round(F.col("_dot") / (F.col("_n") * F.lit(qn)), 6))
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def synth_clustered_embeddings(
    spark, n: int, dim: int = 64, n_clusters: int = 32, noise: float = 0.15,
    n_parts: int = 16,
) -> DataFrame:
    """Deterministic clustered vectors (cluster center + per-row noise, both
    md5-seeded pure functions of the row id) — uniform random vectors give
    every ANN chance-level recall; real embedding corpora are clustered,
    which is the regime LSH exploits. Distributed via mapInPandas."""
    import hashlib

    import numpy as np
    import pandas as pd

    def centers() -> np.ndarray:
        out = np.empty((n_clusters, dim), dtype=np.float64)
        for c in range(n_clusters):
            seed = int.from_bytes(hashlib.md5(f"center{c}".encode()).digest()[:8], "little")
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(dim)
            out[c] = v / np.linalg.norm(v)
        return out

    def gen(batches):
        C = centers()
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = np.empty((len(ids), dim), dtype=np.float32)
            for i, rid in enumerate(ids):
                c = int(rid) % n_clusters
                seed = int.from_bytes(hashlib.md5(f"row{rid}".encode()).digest()[:8], "little")
                rng = np.random.default_rng(seed)
                v = C[c] + noise * rng.standard_normal(dim)
                rows[i] = (v / np.linalg.norm(v)).astype(np.float32)
            yield pd.DataFrame({
                "vec_id": ids,
                "cluster": ids % n_clusters,
                "embedding": list(rows),
            })

    return spark.range(0, n, 1, n_parts).mapInPandas(
        gen, "vec_id long, cluster long, embedding array<float>"
    )


def query_vector_for_cluster(c: int, dim: int = 64, n_clusters: int = 32) -> list[float]:
    """A query near cluster c's center (same deterministic construction)."""
    import hashlib

    import numpy as np

    seed = int.from_bytes(hashlib.md5(f"center{c}".encode()).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    v = v / np.linalg.norm(v)
    qseed = int.from_bytes(hashlib.md5(f"query{c}".encode()).digest()[:8], "little")
    qrng = np.random.default_rng(qseed)
    q = v + 0.1 * qrng.standard_normal(dim)
    q = q / np.linalg.norm(q)
    return [float(x) for x in q]


def ann_recall(
    spark, index_path: str, emb: DataFrame, queries: list[list[float]],
    k: int = 10, n_planes: int = 6, multiprobe: int = 1,
) -> dict:
    """recall@k of the indexed ANN probe vs the brute-force baseline."""
    hits = 0
    total = 0
    for q in queries:
        truth = {r[0] for r in cosine_topk(emb, q, k).collect()}
        approx = {
            r[0] for r in ann_topk_indexed(
                spark, index_path, q, k, n_planes, multiprobe
            ).collect()
        }
        hits += len(truth & approx)
        total += k
    return {"recall_at_k": round(hits / total, 4), "k": k, "n_queries": len(queries)}
