"""Sequence packing — the "concat and chunk" step that turns a cleaned
corpus into fixed-length training sequences (the GPT-style pretraining
convention: concatenate all documents in a deterministic shuffle order,
then split the token stream at every ``seq_len`` boundary; a document
that straddles a boundary is split across the adjacent chunks).

Not a reference operator (mycelium has no training-data concepts); a
first-class LLM-pipeline stage here alongside dedup / quality /
decontamination / token-budget sampling.

Semantics:
* tokens = whitespace split, empties dropped (the pipeline's shared
  tokenizer); documents with zero tokens contribute nothing;
* global order = md5(doc_id) — the same deterministic shuffle key as
  token-budget sampling (``operators/sampling.py``);
* document d occupying token interval [start, start+n) is emitted once
  per chunk it overlaps: (doc_id, chunk_id, piece_start, piece_len)
  where ``piece_start`` is the offset INSIDE the document and the
  pieces of one chunk concatenate to exactly ``seq_len`` tokens (the
  final chunk may be shorter).

Scale shape (100 TB corpus): the global token offsets come from the
same two-phase distributed prefix sum as sampling — 256 lexical
md5-prefix buckets, bucket totals to the driver (256 rows), offsets
broadcast back, per-bucket windows — so there is NO single-reducer
global window. The chunk explode fans each row out to
ceil(n_tokens/seq_len)+1 rows at most, integers only; document text
never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import sampling


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, chunk_id, piece_start, piece_len), one row per
    (document, chunk) overlap; integer token offsets, fully
    deterministic."""
    t = sampling.cumulative_tokens(docs, text_col, id_col).filter(
        F.col("n_tokens") > 0
    )
    t = t.withColumn("_start", F.col("cum_tokens") - F.col("n_tokens"))
    # integer DIV, not double division: token offsets exceed 2^53 at
    # 100 TB-corpus scale, where a double round-trip would mis-bin
    t = t.withColumn("_first", F.expr(f"_start DIV {seq_len}")).withColumn(
        "_last", F.expr(f"(cum_tokens - 1) DIV {seq_len}")
    )
    out = t.select(
        id_col,
        "_start",
        "cum_tokens",
        F.explode(F.expr("sequence(_first, _last)")).alias("chunk_id"),
    )
    chunk_lo = F.col("chunk_id") * seq_len
    chunk_hi = (F.col("chunk_id") + 1) * seq_len
    return out.select(
        id_col,
        F.col("chunk_id").cast("long"),
        F.greatest(chunk_lo - F.col("_start"), F.lit(0))
        .cast("long")
        .alias("piece_start"),
        (
            F.least(chunk_hi, F.col("cum_tokens"))
            - F.greatest(chunk_lo, F.col("_start"))
        )
        .cast("long")
        .alias("piece_len"),
    )


def pack_sequences_sql(seq_len: int, source: str = "documents") -> str:
    """DuckDB twin — the straightforward global-window form (the oracle
    can afford the single-reducer cumulative sum)."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM {source}
), c AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY h, doc_id) AS BIGINT) AS cum_tokens
  FROM t WHERE n_tokens > 0
), e AS (
  SELECT doc_id, cum_tokens - n_tokens AS start, cum_tokens,
         unnest(generate_series((cum_tokens - n_tokens) // {seq_len},
                                (cum_tokens - 1) // {seq_len})) AS chunk_id
  FROM c
)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(greatest(chunk_id * {seq_len} - start, 0) AS BIGINT) AS piece_start,
       CAST(least((chunk_id + 1) * {seq_len}, cum_tokens)
            - greatest(chunk_id * {seq_len}, start) AS BIGINT) AS piece_len
FROM e
"""
