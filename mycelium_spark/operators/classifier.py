"""Linear text-quality classifier: the fastText-style model-scoring stage.

Modern pipelines gate documents with a trained linear classifier over
bag-of-words features (fastText: Joulin et al. 2016; used as the
quality gate in LLaMA's CCNet variant and as DCLM's headline filter).
The reference engine has no model-scoring surface at all, so this is
pipeline-brief scope: the hashing-trick featurizer + weight-table dot
product + threshold gate, with the weights PLUGGABLE — a real trained
model drops in as a (bucket, weight_milli) table with zero plan
changes. No model artifacts ship in this environment, so the default
weight table is a deterministic stand-in derived from the bucket id
(documented, like the multimodal decode fake), and the plumbing is the
tested part.

Semantics:

* features: T1 tokens → 28-bit md5 hash (the repo-wide
  ``conv(substr(md5,1,7),16,10)`` idiom) → ``dim`` buckets;
* score: logit = Σ_tokens tf · w(bucket), fastText's mean-of-features
  scaling applied at the gate — weights are integer MILLI-units, so the
  whole score path is exact BIGINT arithmetic (no float anywhere);
* gate: keep ⇔ logit_sum ≥ thr · n_tokens / 1000, evaluated as the
  exact integer cross-multiply ``logit_sum * 1000 >= thr_milli *
  n_tokens`` (the decontam discipline); ``avg_logit_milli`` (one double
  divide, 6 dp) is reported for ranking/bucketing consumers.

Scale shape: one token explode (shared shape with the index/LM stages),
one BROADCAST join against the weight table — fastText vocabs hash into
2^21 buckets ≈ a few MB of (long, long) rows, always broadcast-able —
then one map-side-combined groupBy(doc). The URL table never shuffles
on anything but doc_id. A multi-class head is the same plan with a
weight column per class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import index

DIM_DEFAULT = 4096
THR_MILLI_DEFAULT = 0  # keep ⇔ mean weight ≥ 0 (stand-in weights center on 0)
_MIX = 2654435761  # Knuth multiplicative constant for the stand-in weights


def default_weights(spark: SparkSession, dim: int = DIM_DEFAULT) -> DataFrame:
    """Deterministic stand-in weight table (bucket, weight_milli) with
    weight_milli ∈ [-1000, 1000]. A trained export replaces this frame."""
    return spark.range(dim).select(
        F.col("id").alias("bucket"),
        (F.col("id") * F.lit(_MIX) % 2001 - 1000).alias("weight_milli"),
    )


def default_weights_sql(dim: int = DIM_DEFAULT) -> str:
    return (
        f"SELECT range AS bucket, (range * {_MIX}) % 2001 - 1000 AS weight_milli "
        f"FROM range({dim})"
    )


def classifier_score(
    docs: DataFrame,
    weights: DataFrame | None = None,
    dim: int = DIM_DEFAULT,
    thr_milli: int = THR_MILLI_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, n_tokens, logit_sum, avg_logit_milli, keep) for every
    doc with ≥1 token. ``weights`` is a (bucket, weight_milli) relation;
    defaults to the deterministic stand-in."""
    if weights is None:
        weights = default_weights(docs.sparkSession, dim)
    dt = index.doc_terms(docs, text_col=text_col, id_col=id_col).withColumn(
        "bucket",
        F.conv(F.substring(F.md5(F.col("term")), 1, 7), 16, 10).cast("long")
        % F.lit(dim),
    )
    return (
        dt.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("weight_milli")).cast("long").alias("logit_sum"),
        )
        .select(
            id_col,
            "n_tokens",
            "logit_sum",
            F.round(
                F.col("logit_sum").cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("avg_logit_milli"),
            (
                F.col("logit_sum") * F.lit(1000)
                >= F.lit(thr_milli) * F.col("n_tokens")
            ).alias("keep"),
        )
    )


def classifier_score_sql(
    weights_sql: str | None = None,
    dim: int = DIM_DEFAULT,
    thr_milli: int = THR_MILLI_DEFAULT,
) -> str:
    """DuckDB twin over the pre-registered ``documents`` view."""
    if weights_sql is None:
        weights_sql = default_weights_sql(dim)
    return f"""
WITH dt AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE regexp_full_match(term, '\\w+')
  GROUP BY doc_id, term
), w AS ( {weights_sql} ),
b AS (
  SELECT doc_id, tf,
         CAST(('0x' || substr(md5(term),1,7)) AS BIGINT) % {dim} AS bucket
  FROM dt
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       CAST(sum(tf * w.weight_milli) AS BIGINT) AS logit_sum,
       round(CAST(sum(tf * w.weight_milli) AS DOUBLE)
             / CAST(sum(tf) AS DOUBLE), 6) AS avg_logit_milli,
       CAST(sum(tf * w.weight_milli) AS BIGINT) * 1000
         >= {thr_milli} * CAST(sum(tf) AS BIGINT) AS keep
FROM b JOIN w ON b.bucket = w.bucket
GROUP BY doc_id
"""
