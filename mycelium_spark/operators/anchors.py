"""Anchor-text aggregation: the incoming-link text field of a web index.

Web search has indexed the text OF LINKS pointing at a page since
Brin & Page 1998 (§2.2 — anchor text "often provides more accurate
descriptions of web pages than the pages themselves"); BM25F treats it
as a separate weighted field. The reference plans exactly this
surface: its inverted index (A5, a declared TODO —
src/local_indexer/local_indexer.cc) indexes page text, and its link
stream (S10, crawler.cc link emission) carries (source, target,
anchor-text) triples the lexer already extracts (html.ll's <a> token
handling; this repo's ``EXTRACT_TYPE.links`` struct keeps both ``url``
and ``txt``). This operator joins the two: per target URL, the top-k
incoming anchor terms by reference count.

Semantics:

* anchor text is tokenized with T1 parity (split on single spaces,
  keep ``^\\w+$``, lowercased — anchor fields are searched
  case-insensitively);
* count = number of (link, term) occurrences pointing at the target —
  a term appearing twice in one anchor counts twice (link spam
  analysis wants the raw mass; the df-style variant is one
  ``distinct`` away);
* per-target ranking: count desc, term asc (total order, so both
  engines cut the same top-k).

Scale shape: one explode over links×terms (the index-build shuffle
shape), one map-side-combined ``groupBy(dst, term)``, then a window
over ``dst`` — partitioned by TARGET URL, a high-cardinality key, so
no single-reducer stage; the hottest target's per-term counts (already
combined) are what sorts, not its raw in-links. Self-links and empty
anchors are dropped at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anchor_terms(
    links: DataFrame,
    top_k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    txt_col: str = "txt",
) -> DataFrame:
    """(src, dst, txt) link triples → (dst, term, cnt, rank), the top-k
    anchor terms per target (count desc, term asc)."""
    terms = (
        links.filter(
            (F.col(src_col) != F.col(dst_col)) & (F.trim(F.col(txt_col)) != "")
        )
        .select(
            F.col(dst_col).alias("dst"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(txt_col)), " "),
                    lambda t: t.rlike("^\\w+$"),
                )
            ).alias("term"),
        )
        .groupBy("dst", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("dst").orderBy(F.desc("cnt"), F.col("term"))
    return (
        terms.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select("dst", "term", "cnt", "rank")
    )


def anchor_terms_sql(links_source: str, top_k: int = 3) -> str:
    """DuckDB twin over a (src, dst, txt) link subquery: identical
    tokenization, counting, and total-order ranking."""
    return f"""
WITH l AS (SELECT * FROM {links_source} WHERE src <> dst AND trim(txt) <> ''),
terms AS (
  SELECT dst, unnest(string_split(lower(txt), ' ')) AS term FROM l
),
counts AS (
  SELECT dst, term, CAST(count(*) AS BIGINT) AS cnt
  FROM terms WHERE regexp_full_match(term, '\\w+')
  GROUP BY dst, term
)
SELECT dst, term, cnt,
       CAST(row_number() OVER (PARTITION BY dst
                               ORDER BY cnt DESC, term) AS BIGINT) AS rank
FROM counts QUALIFY rank <= {top_k}
"""
