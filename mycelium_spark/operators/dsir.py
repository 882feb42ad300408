"""DSIR-style importance resampling: distribution-matched data selection.

The published data-mixing stage beyond hard filters (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"; the
recipe behind many "match the target domain" corpus builds): estimate a
target and a raw feature distribution over hashed n-gram buckets,
weight every raw document by its log importance ratio, and resample by
Gumbel top-k — selection WITHOUT replacement, in expectation
proportional to the importance weights. The reference engine has no
model/selection surface (it stops at crawl + index), so this is
pipeline-brief scope like the classifier and perplexity gates.

Semantics:

* features: T1 tokens (split on single spaces, keep ``^\\w+$``) plus
  their adjacent bigrams — the paper's hashed n-gram feature space —
  hashed into ``dim`` buckets with the repo-wide 28-bit md5 idiom
  (``conv(substr(md5(f),1,7),16,10) % dim``);
* target distribution p = docs matching ``target_pred`` (a SQL boolean
  over doc_id — the lm.py slice-training trick, so both engines pick
  the same slice); raw distribution q = the whole corpus. Both are
  Laplace-smoothed over the full ``dim`` buckets:
  p_b = (cnt_b + 1) / (T + dim);
* per-doc log weight = Σ_features (ln p_b − ln q_b), each ln rounded
  to 6 dp (the tf_idf/lm.py float-parity discipline) and the sum run
  in exact DECIMAL — order-independent across shuffles;
* Gumbel top-k: key = log_weight + g, g = −ln(−ln(u)) with
  u = (md5_28bit("dsir:" + doc_id) % 10^6 + 1) / (10^6 + 1) ∈ (0,1) —
  a deterministic hash-uniform, so both engines draw the SAME noise;
  the k largest keys are the selected sample (desc key, doc_id
  tie-break).

Scale shape: one feature explode (the index/LM shuffle shape); ONE
map-side-combined groupBy(bucket) producing both distributions (p via
count_if, q via count); the weight table is ≤ dim rows → BROADCAST
back onto the exploded features (no second shuffle key); one
groupBy(doc_id); selection is a global top-k = TakeOrderedAndProject,
never a single-reducer window. Nothing document-sized is collected;
T_p/T_q are two driver scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TARGET_PRED_DEFAULT = "doc_id % 5 = 0"
DIM_DEFAULT = 4096
K_DEFAULT = 100
_U_MOD = 1_000_000


def doc_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (id, feat) exploded unigram + adjacent-bigram features, one row
    per OCCURRENCE (the importance sum needs multiplicity, so no
    per-doc distinct here)."""
    toks = F.filter(
        F.split(F.col(text_col), " "), lambda t: t.rlike("^\\w+$")
    )
    docs = docs.select(id_col, toks.alias("_toks"))
    bi = F.when(
        F.size("_toks") >= 2,
        F.zip_with(
            F.slice("_toks", 1, F.size("_toks") - 1),
            F.slice("_toks", 2, F.size("_toks") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        id_col, F.explode(F.concat("_toks", bi)).alias("feat")
    )


def dsir_sample(
    docs: DataFrame,
    target_pred: str = TARGET_PRED_DEFAULT,
    dim: int = DIM_DEFAULT,
    k: int = K_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ the k selected docs as (doc_id, n_feats, log_ratio, sel_key),
    Gumbel top-k over hashed-n-gram importance weights."""
    feats = doc_features(docs, text_col=text_col, id_col=id_col).withColumn(
        "bucket",
        F.conv(F.substring(F.md5(F.col("feat")), 1, 7), 16, 10).cast("long")
        % F.lit(dim),
    )
    counts = (
        feats.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("q_cnt"),
            F.sum(F.when(F.expr(target_pred), 1).otherwise(0))
            .cast("long")
            .alias("p_cnt"),
        )
        .localCheckpoint(eager=True)  # scanned twice: totals + weight join
    )
    tot = counts.agg(
        F.sum("p_cnt").cast("long").alias("tp"), F.sum("q_cnt").cast("long").alias("tq")
    ).collect()[0]
    denom_p, denom_q = float(tot["tp"] + dim), float(tot["tq"] + dim)
    weights = counts.select(
        "bucket",
        (
            F.round(F.log((F.col("p_cnt") + 1.0) / F.lit(denom_p)), 6).cast(
                "decimal(13,6)"
            )
            - F.round(F.log((F.col("q_cnt") + 1.0) / F.lit(denom_q)), 6).cast(
                "decimal(13,6)"
            )
        ).alias("w"),
    )
    scored = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("w").alias("_w_sum"),
        )
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dsir:"), F.col(id_col).cast("string"))), 1, 7),
            16,
            10,
        ).cast("long")
        % _U_MOD
        + 1
    ).cast("double") / F.lit(float(_U_MOD + 1))
    gumbel = F.round(-F.log(-F.log(u)), 6)
    out = scored.select(
        id_col,
        "n_feats",
        F.round(F.col("_w_sum").cast("double"), 6).alias("log_ratio"),
        F.round(F.col("_w_sum").cast("double") + gumbel, 6).alias("sel_key"),
    )
    return out.orderBy(F.desc("sel_key"), F.col(id_col)).limit(k)


def dsir_sample_sql(
    target_pred: str = TARGET_PRED_DEFAULT,
    dim: int = DIM_DEFAULT,
    k: int = K_DEFAULT,
) -> str:
    """DuckDB twin over the pre-registered ``documents`` view: identical
    tokenization, bucket hash, smoothing, decimal sum, and Gumbel draw."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '),
                     t -> regexp_full_match(t, '\\w+')) AS tk
  FROM documents
), feats AS (
  SELECT doc_id,
         unnest(tk || [tk[i] || ' ' || tk[i+1]
                       for i in generate_series(1, len(tk) - 1)]) AS feat
  FROM toks
), b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(feat), 1, 7)) AS BIGINT) % {dim} AS bucket,
         {target_pred} AS is_target
  FROM feats
), counts AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS q_cnt,
         CAST(count(*) FILTER (WHERE is_target) AS BIGINT) AS p_cnt
  FROM b GROUP BY bucket
), tot AS (
  SELECT CAST(sum(p_cnt) AS DOUBLE) + {dim} AS denom_p,
         CAST(sum(q_cnt) AS DOUBLE) + {dim} AS denom_q
  FROM counts
), w AS (
  SELECT bucket,
         CAST(round(ln((p_cnt + 1.0) / (SELECT denom_p FROM tot)), 6)
              AS DECIMAL(13,6))
         - CAST(round(ln((q_cnt + 1.0) / (SELECT denom_q FROM tot)), 6)
                AS DECIMAL(13,6)) AS w
  FROM counts
), scored AS (
  SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_feats, sum(w.w) AS w_sum
  FROM b JOIN w ON b.bucket = w.bucket
  GROUP BY b.doc_id
), keyed AS (
  SELECT doc_id, n_feats,
         round(CAST(w_sum AS DOUBLE), 6) AS log_ratio,
         round(CAST(w_sum AS DOUBLE)
               + round(-ln(-ln(
                   (CAST(('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 7))
                         AS BIGINT) % {_U_MOD} + 1) / {float(_U_MOD + 1)!r})), 6),
               6) AS sel_key
  FROM scored
)
SELECT doc_id, n_feats, log_ratio, sel_key
FROM keyed ORDER BY sel_key DESC, doc_id LIMIT {k}
"""
