"""Cross-document line/paragraph deduplication: the CCNet boilerplate
scrub.

CCNet (Wenzek et al. 2020 §3.1) deduplicates web text at the PARAGRAPH
level before any document-level filtering: every paragraph is hashed
(after light normalization) and only the first occurrence across the
whole snapshot survives — this is what removes navigation bars, cookie
banners and license boilerplate that per-document repetition rules
(Gopher Table A1, ``quality.repetition_filter``) cannot see, because
each document contains the offending line only once. The same stage
appears in RefinedWeb and MassiveText as "line-level dedup". The
reference engine has no document-editing surface (crawl + index only),
so this is pipeline-brief scope alongside span removal.

Semantics:

* lines split on ``\\n``; the dedup key is ``md5(lower(trim(line)))``
  (the CCNet normalization is case folding; trim makes indentation
  variants collide);
* blank lines (``trim = ''``) bypass dedup — they are document
  structure, and hashing them would collapse every paragraph break in
  the corpus onto one survivor;
* the surviving copy of a duplicated line is the corpus-order first:
  min ``(doc_id, pos)`` — deterministic, partitioning-invariant;
* documents are reassembled from their kept lines in position order;
  a document whose every line was someone else's duplicate drops out
  entirely (the planted-dup fixture pairs exercise this).

Scale shape: one line explode (the index/LM shuffle shape); one
map-side-combined ``groupBy(key)`` taking ``min(struct(doc_id, pos))``
— partial aggregation absorbs the boilerplate skew ("accept cookies"
appearing in 10^9 docs combines to one row per map task, never a hot
sort, which is why this is a groupBy+join and NOT a window over key —
``row_number() OVER (PARTITION BY key)`` would buffer the hottest
line's every occurrence in one task); one key-equi-join back (AQE
skew-join handles the hot probe side); one ``groupBy(doc_id)``
reassembly. Document text moves through the explode once and is
reassembled once; nothing is collected or broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_lines(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, n_lines, n_removed, clean_text) for every doc with ≥1
    surviving line; duplicated lines keep only their corpus-order first
    occurrence."""
    lines = docs.select(
        id_col, F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line")
    ).withColumn("key", F.md5(F.lower(F.trim("line")).cast("binary"))).withColumn(
        "blank", F.trim("line") == ""
    )
    firsts = (
        lines.filter(~F.col("blank"))
        .groupBy("key")
        .agg(F.min(F.struct(id_col, "pos")).alias("first"))
    )
    flagged = lines.join(firsts, "key", "left").withColumn(
        "keep",
        F.col("blank") | (F.struct(id_col, "pos") == F.col("first")),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("pos", "line"))
                        )
                    ),
                    lambda x: x["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
        .filter(F.col("n_lines") > F.col("n_removed"))
        .select(id_col, "n_lines", "n_removed", "clean_text")
    )


def dedup_lines_sql(source: str = "documents") -> str:
    """DuckDB twin: identical split, normalization, corpus-order-first
    rule, blank bypass, and position-ordered reassembly."""
    return f"""
WITH src AS (SELECT * FROM {source}),
lines AS (
  SELECT doc_id, u.pos AS pos, u.line AS line
  FROM (SELECT doc_id,
               unnest([{{'pos': i - 1, 'line': lns[i]}}
                       for i in generate_series(1, len(lns))]) AS u
        FROM (SELECT doc_id, string_split(text, chr(10)) AS lns FROM src))
),
keyed AS (
  SELECT *, md5(lower(trim(line))) AS key, trim(line) = '' AS blank FROM lines
),
firsts AS (
  SELECT key, min(ROW(doc_id, pos)) AS first FROM keyed WHERE NOT blank GROUP BY key
),
flagged AS (
  SELECT k.doc_id, k.pos, k.line,
         k.blank OR ROW(k.doc_id, k.pos) = f.first AS keep
  FROM keyed k LEFT JOIN firsts f ON k.key = f.key
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_removed,
       string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE keep) AS clean_text
FROM flagged GROUP BY doc_id
HAVING count(*) FILTER (WHERE keep) > 0
"""
