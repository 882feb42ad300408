"""Language-model quality scoring: the CCNet-style perplexity filter.

Every published web-corpus pipeline (CCNet, Wenzek et al. 2020;
Gopher, Rae et al. 2021 §A1.2) scores documents with a language model
trained on a trusted reference corpus and drops/buckets by perplexity.
The reference engine stops at crawling + indexing (its tokenizer is the
only text-analysis surface, dist/utils/__init__.py:69-73), so this is
pipeline-brief scope: the same train-on-reference / score-everything
shape with an in-engine unigram LM standing in for KenLM (no model
artifacts ship in this environment; the plumbing — token explode,
count join, exact aggregation, threshold gate — is the part that has
to survive 100 TB, and is identical for any n-gram order).

Semantics:

* tokens are T1 parity (split on single spaces, keep ``^\\w+$``) —
  the same ``index.doc_terms`` explode the inverted index uses;
* the LM trains on the slice selected by ``train_pred`` (a SQL boolean
  over doc_id so both engines filter identically) — unigram counts,
  T = total training tokens, V = training vocabulary size;
* every document (trained-on or not) is scored with Laplace smoothing:
  nll(term) = ln((T+V) / (cnt(term)+1)), so out-of-vocabulary terms get
  the maximum surprise ln(T+V) — the held-out branch is real;
* doc score = tf-weighted mean nll, i.e. log-perplexity: perplexity =
  e^score, monotone, so the keep gate thresholds the score directly
  (CCNet's head/middle/tail split is a pair of such thresholds).

Determinism (driver value-hash gate): per-term nll is rounded to 6 dp
(the tf_idf discipline — ln parity at 6 dp has held across rounds),
then tf-weighting and summation run in exact DECIMAL arithmetic —
DECIMAL(12,6) × DECIMAL(10,0) products summed as decimals are
order-independent, so shuffle order never enters. Only the final
mean (one double divide + round) touches floats again.

Scale shape: one token explode (the same shuffle the index build pays),
one map-side-combined groupBy(term) for counts, one (term)-keyed join
of tokens against counts — skewed stopword terms are the AQE skew-join
case — and one groupBy(doc_id). T and V are two bounded driver scalars
(the pagerank n-count pattern). Nothing document-sized is broadcast or
collected; a 5-gram KenLM swap would replace the count join with a
mapInPandas scoring stage and keep every other edge identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import index

TRAIN_PRED_DEFAULT = "doc_id % 5 = 0"
# Keep docs with log-perplexity <= this. 3.42 sits at the ~80th pct of the
# synthetic corpus's score distribution (3.35-3.70, planted-dup tail above
# 3.43), so both gate branches populate at every fixture SF.
NLL_KEEP_MAX_DEFAULT = 3.42


def unigram_nll(
    docs: DataFrame,
    train_pred: str = TRAIN_PRED_DEFAULT,
    nll_keep_max: float = NLL_KEEP_MAX_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, n_tokens, avg_nll, keep) for every doc with ≥1 token.

    ``train_pred`` is a SQL boolean over the id column selecting the LM
    training slice; ``avg_nll`` is the tf-weighted mean negative log
    probability (log-perplexity), 6 dp.
    """
    dt = index.doc_terms(docs, text_col=text_col, id_col=id_col)
    counts = (
        dt.filter(F.expr(train_pred))
        .groupBy("term")
        .agg(F.sum("tf").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)  # scanned twice: totals + score join
    )
    tv = counts.agg(
        F.sum("cnt").cast("long").alias("t"), F.count(F.lit(1)).cast("long").alias("v")
    ).collect()[0]
    denom = float(tv["t"] + tv["v"])  # bounded driver scalars (2 longs)
    scored = (
        dt.join(counts, "term", "left")
        .withColumn(
            "_nll",
            F.round(F.log(F.lit(denom) / (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)), 6),
        )
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            # exact decimal sum: order-independent across shuffles
            F.sum(
                F.col("_nll").cast("decimal(12,6)") * F.col("tf").cast("decimal(10,0)")
            ).alias("_sum_nll"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        F.round(
            F.col("_sum_nll").cast("double") / F.col("n_tokens").cast("double"), 6
        ).alias("avg_nll"),
    ).withColumn("keep", F.col("avg_nll") <= F.lit(nll_keep_max))


def unigram_nll_sql(
    train_pred: str = TRAIN_PRED_DEFAULT,
    nll_keep_max: float = NLL_KEEP_MAX_DEFAULT,
) -> str:
    """DuckDB twin: identical tokenization, counts, smoothing and decimal
    aggregation over the pre-registered ``documents`` view."""
    return f"""
WITH dt AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE regexp_full_match(term, '\\w+')
  GROUP BY doc_id, term
), counts AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS cnt FROM dt
  WHERE {train_pred} GROUP BY term
), tv AS (
  SELECT CAST(sum(cnt) AS DOUBLE) + CAST(count(*) AS DOUBLE) AS denom FROM counts
), scored AS (
  SELECT dt.doc_id, CAST(sum(dt.tf) AS BIGINT) AS n_tokens,
         sum(CAST(round(ln((SELECT denom FROM tv)
                           / (coalesce(c.cnt, 0) + 1.0)), 6) AS DECIMAL(12,6))
             * CAST(dt.tf AS DECIMAL(10,0))) AS sum_nll
  FROM dt LEFT JOIN counts c ON dt.term = c.term
  GROUP BY dt.doc_id
)
SELECT doc_id, n_tokens,
       round(CAST(sum_nll AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS avg_nll,
       round(CAST(sum_nll AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         <= {nll_keep_max!r} AS keep
FROM scored
"""
