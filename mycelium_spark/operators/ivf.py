"""IVF (inverted-file) ANN: k-means coarse quantizer + partition-pruned probes.

Complements the hyperplane LSH in operators/similarity.py: sign buckets
are data-independent (good for oracle exactness, weak when the corpus is
unevenly distributed); IVF trains centroids on a sample so the partition
sizes follow the data. The standard two-stage design:

* TRAIN: k-means (Lloyd's, fixed iterations, deterministic md5-seeded
  init) on a driver-collected sample — the coarse quantizer is a few
  KB of centroids, the training sample a few MB; both deliberately
  driver-side, as in FAISS/Spark-ANN practice;
* BUILD: every vector assigned to its nearest centroid by a vectorized
  pandas UDF (one numpy matmul per Arrow batch — the argmin over
  n_centroids is dense linear algebra, not a JVM-expression shape) and
  written PARTITIONED BY list id, so a probe reads only nprobe
  partitions;
* PROBE: the query's nprobe nearest centroids are computed driver-side
  (centroids are local), the scan is partition-pruned to those lists,
  exact cosine + TakeOrderedAndProject ranks survivors.

Recall/efficiency trade is nprobe/n_centroids; measured by ivf_recall
(same harness as the LSH index).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _dot_expr, _norm_expr, _qnorm


def _det_rng(tag: str) -> np.random.Generator:
    seed = int.from_bytes(hashlib.md5(tag.encode()).digest()[:8], "little")
    return np.random.default_rng(seed)


def train_centroids(
    emb: DataFrame, n_centroids: int, sample_rows: int = 20_000, n_iters: int = 10,
    vec_col: str = "embedding", seed_tag: str = "ivf",
) -> np.ndarray:
    """Lloyd's k-means on a deterministic sample; returns (k, dim) float64.

    Empty clusters are re-seeded from the farthest points (standard fix),
    keeping the run deterministic.
    """
    # first-N sample: deterministic and cheap; a physically cluster-ordered
    # table should pre-shuffle or hash-sample instead (bias caveat)
    frac_rows = emb.select(vec_col).limit(sample_rows).collect()
    X = np.asarray([r[0] for r in frac_rows], dtype=np.float64)
    if len(X) < n_centroids:
        raise ValueError(f"sample ({len(X)}) smaller than n_centroids ({n_centroids})")
    rng = _det_rng(f"{seed_tag}-init")
    C = X[rng.choice(len(X), n_centroids, replace=False)].copy()
    for _ in range(n_iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for k in range(n_centroids):
            members = X[assign == k]
            if len(members):
                C[k] = members.mean(axis=0)
            else:  # re-seed dead centroid at the point farthest from its center
                C[k] = X[d2.min(axis=1).argmax()]
    return C


def build_ivf_index(
    emb: DataFrame, path: str, n_centroids: int = 32, sample_rows: int = 20_000,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> np.ndarray:
    """Train the quantizer, assign every row to its list, write partitioned
    by list id. Returns the centroids (also persisted next to the data)."""
    C = train_centroids(emb, n_centroids, sample_rows, vec_col=vec_col)
    Cb = emb.sparkSession.sparkContext.broadcast(C)
    in_cols = emb.columns
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in emb.schema.fields)
    out_schema = f"{schema}, list_id int"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cl = Cb.value
        cn = (Cl * Cl).sum(axis=1)  # ||c||² term; argmin ||x-c||² = argmin cn-2x·c
        for pdf in batches:
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            lists = (cn[None, :] - 2.0 * (X @ Cl.T)).argmin(axis=1)
            out = pdf[in_cols].copy()
            out["list_id"] = lists.astype(np.int32)
            yield out

    (
        emb.mapInPandas(assign, out_schema)
        # cluster by list before the write: one writer task per list, not
        # (input partitions x lists) tiny files (guide §6)
        .repartition(F.col("list_id"))
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(path)
    )
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump(C.tolist(), f)
    return C


def load_centroids(path: str) -> np.ndarray:
    with open(os.path.join(path, "_centroids.json")) as f:
        return np.asarray(json.load(f), dtype=np.float64)


def query_lists(query: list[float], C: np.ndarray, nprobe: int) -> list[int]:
    q = np.asarray(query, dtype=np.float64)
    d2 = ((C - q[None, :]) ** 2).sum(axis=1)
    return [int(i) for i in d2.argsort()[:nprobe]]


def ivf_topk(
    spark, path: str, query: list[float], k: int = 10, nprobe: int = 2,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Top-k over the IVF index: partition-pruned scan of nprobe lists,
    exact cosine, TakeOrderedAndProject."""
    C = load_centroids(path)
    probe = query_lists(query, C, nprobe)
    qn = _qnorm(query)
    return (
        spark.read.parquet(path)
        .filter(F.col("list_id").isin(probe))
        .withColumn("_dot", F.expr(_dot_expr(vec_col, query)))
        .withColumn("_n", F.expr(_norm_expr(vec_col)))
        .withColumn("cosine", F.round(F.col("_dot") / (F.col("_n") * F.lit(qn)), 6))
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_recall(
    spark, path: str, emb: DataFrame, queries: list[list[float]],
    k: int = 10, nprobe: int = 2,
) -> dict:
    """recall@k of the IVF probe vs the brute-force baseline."""
    from .similarity import cosine_topk

    hits = total = 0
    for q in queries:
        truth = {r[0] for r in cosine_topk(emb, q, k).collect()}
        approx = {r[0] for r in ivf_topk(spark, path, q, k, nprobe).collect()}
        hits += len(truth & approx)
        total += k
    return {"recall_at_k": round(hits / total, 4), "k": k, "n_queries": len(queries),
            "nprobe": nprobe}
