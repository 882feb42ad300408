"""Benchmark decontamination — per-document n-gram overlap against a
held-out evaluation set.

The published convention for training-data pipelines (Brown et al. 2020
appendix C "13-gram collision" filtering; Rae et al. 2021 §A.2): a
training document is contaminated when too large a fraction of its
token n-grams also occur in the benchmark/eval corpus. Not a reference
operator (mycelium has no training-data concepts, VERDICT r4 missing #1);
first-class here alongside dedup + quality.

Semantics:
* tokens = whitespace split, empties dropped (same tokenizer as the
  repetition rules); grams = the doc's DISTINCT n-grams (a gram repeated
  inside one doc counts once);
* ``overlap_frac`` = |doc grams ∩ eval grams| / |doc grams|;
* ``keep`` ⇔ overlap_frac ≤ threshold (exactly-at-threshold keeps), via
  exact integer cross-multiplication — no float compare;
* a doc with fewer than n tokens has zero grams → overlap 0 → keep.

Scale shape (100 TB corpus, benchmark-suite-sized eval set): the eval
shingle table is tiny relative to the corpus (≤ millions of distinct
13-gram hashes) → **broadcast** it; each doc row explodes only to its
distinct n-gram hashes (bounded by doc length), the broadcast hash join
marks collisions with no shuffle, and the per-doc counts reduce with
map-side combine, so the only shuffles are one count row per doc plus
the doc_id equi-join back — document text itself never moves. Grams are
md5'd (128-bit, collision-free at corpus scale) so the exploded rows are
fixed-width 32-char keys, not arbitrarily long phrases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_DEFAULT = 13  # the GPT-3/Gopher convention
THRESHOLD_DEFAULT = 0.05

_SCALE = 10**6  # threshold resolution for the exact integer compare


def _ngram_md5_arr(text_col: str, n: int) -> str:
    """SQL expr: DISTINCT md5'd token n-grams of a text column (per-row
    array; empty when the doc has fewer than n tokens)."""
    toks = f"filter(split({text_col}, ' '), t -> t != '')"
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> md5(concat_ws(' ', slice({toks}, i, {n}))))) "
        f"ELSE array() END"
    )


def eval_ngrams(
    eval_docs: DataFrame, n: int = N_DEFAULT, text_col: str = "text"
) -> DataFrame:
    """Distinct n-gram hash table (gram_h) of the evaluation corpus — the
    small side, built once and broadcast into every decontamination run."""
    return (
        eval_docs.select(F.explode(F.expr(_ngram_md5_arr(text_col, n))).alias("gram_h"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = N_DEFAULT,
    threshold: float = THRESHOLD_DEFAULT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, n_grams, n_matched, overlap_frac, keep) per training doc."""
    thr_i = int(round(threshold * _SCALE))
    ev = eval_ngrams(eval_docs, n, text_col).withColumn("_hit", F.lit(1))
    grams = docs.select(
        F.col(id_col), F.explode(F.expr(_ngram_md5_arr(text_col, n))).alias("gram_h")
    )
    stats = (
        grams.join(F.broadcast(ev), "gram_h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_matched"),
        )
    )
    out = (
        docs.select(id_col)
        .join(stats, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
        )
    )
    return out.select(
        id_col,
        "n_grams",
        "n_matched",
        F.when(
            F.col("n_grams") > 0, F.round(F.col("n_matched") / F.col("n_grams"), 6)
        )
        .otherwise(F.lit(0.0))
        .alias("overlap_frac"),
        (F.col("n_matched") * _SCALE <= F.lit(thr_i) * F.col("n_grams")).alias("keep"),
    )


def decontaminate_sql(
    n: int = N_DEFAULT,
    threshold: float = THRESHOLD_DEFAULT,
    source: str = "documents",
    eval_source: str = "documents",
) -> str:
    """DuckDB twin over any (doc_id, text) relations."""
    thr_i = int(round(threshold * _SCALE))
    ng = (
        f"[md5(array_to_string(toks[i+1:i+{n}], ' ')) "
        f"for i in range(0, greatest(len(toks) - {n} + 1, 0))]"
    )
    return f"""
WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
           FROM {source}),
te AS (SELECT list_filter(string_split(text, ' '), x -> x != '') AS toks
       FROM {eval_source}),
g AS (SELECT DISTINCT doc_id, unnest({ng}) AS gram_h FROM t),
ev AS (SELECT DISTINCT unnest({ng}) AS gram_h FROM te),
st AS (SELECT g.doc_id, count(*) AS n_grams,
              sum(CASE WHEN ev.gram_h IS NOT NULL THEN 1 ELSE 0 END) AS n_matched
       FROM g LEFT JOIN ev ON g.gram_h = ev.gram_h GROUP BY g.doc_id)
SELECT t.doc_id,
       CAST(coalesce(st.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(st.n_matched, 0) AS BIGINT) AS n_matched,
       CASE WHEN coalesce(st.n_grams, 0) > 0
            THEN round(CAST(st.n_matched AS DOUBLE) / st.n_grams, 6)
            ELSE 0.0 END AS overlap_frac,
       CAST(coalesce(st.n_matched, 0) AS BIGINT) * {_SCALE}
         <= {thr_i} * CAST(coalesce(st.n_grams, 0) AS BIGINT) AS keep
FROM t LEFT JOIN st ON t.doc_id = st.doc_id
"""
