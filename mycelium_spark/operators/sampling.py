"""Deterministic token-budget sampling — the data-mixing stage of a
training pipeline ("take the first N tokens of this corpus under a fixed
shuffle"): documents are ordered by a deterministic pseudo-random key
(md5 of the doc id), and the greedy prefix is kept until the running
token total crosses the budget (the boundary-crossing document is
included — its prefix fills the budget exactly in a real tokenizer
pipeline).

Scale shape — the naive form is a GLOBAL ordered cumulative sum, i.e. a
single-reducer window: the classic anti-pattern at corpus scale. This
implementation uses the two-phase distributed prefix sum instead:

1. bucket every row by the first two hex chars of its order key — 256
   LEXICAL buckets, so bucket order is a prefix of the global order and
   md5 uniformity keeps them balanced;
2. per-bucket token totals (256 rows) come to the driver, a prefix scan
   over them yields each bucket's global offset (O(buckets), like the
   bounded Bloom-bitmap and k-means-sample precedents), broadcast back;
3. the cumulative sum inside each bucket is a window partitioned BY
   bucket — fully parallel — plus the bucket's offset.

Result is bit-identical to the global window at any partitioning, with
no single-reducer stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cumulative_tokens(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, n_tokens, cum_tokens) over the md5-keyed global order,
    computed with the two-phase distributed prefix sum (bit-identical to
    a global ordered window at any partitioning — pinned in
    tests/test_sampling.py). Shared by token-budget sampling and
    sequence packing."""
    toks = f"size(filter(split({text_col}, ' '), t -> t != ''))"
    t = docs.select(
        F.col(id_col),
        F.expr(toks).cast("long").alias("n_tokens"),
        F.expr(f"md5(cast(cast({id_col} AS string) AS binary))").alias("_h"),
    ).withColumn("_b", F.substring("_h", 1, 2))
    btot = t.groupBy("_b").agg(F.sum("n_tokens").alias("_t")).collect()
    offsets, acc = [], 0
    for row in sorted(btot, key=lambda r: r["_b"]):
        offsets.append((row["_b"], acc))
        acc += row["_t"]
    off = t.sparkSession.createDataFrame(offsets, "_b string, _off long")
    w = Window.partitionBy("_b").orderBy("_h", id_col)
    return (
        t.join(F.broadcast(off), "_b")
        .withColumn("cum_tokens", F.sum("n_tokens").over(w) + F.col("_off"))
        .select(id_col, "n_tokens", "cum_tokens")
    )


def sample_to_token_budget(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, n_tokens, cum_tokens) for the kept greedy prefix:
    rows whose cumulative token count STARTS below the budget."""
    return cumulative_tokens(docs, text_col, id_col).filter(
        F.col("cum_tokens") - F.col("n_tokens") < budget
    )


def sample_to_token_budget_sql(budget: int, source: str = "documents") -> str:
    """DuckDB twin — the straightforward global window (the oracle can
    afford the single-reducer form)."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM {source}
), c AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY h, doc_id) AS BIGINT) AS cum_tokens
  FROM t
)
SELECT doc_id, n_tokens, cum_tokens FROM c
WHERE cum_tokens - n_tokens < {budget}
"""
