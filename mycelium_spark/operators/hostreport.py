"""Per-host corpus report: the domain-level summary that drives
mixture weighting and crawl policy.

Every published pipeline reports and acts on per-domain statistics —
RefinedWeb and C4 blocklist domains, Dolma publishes per-domain token
counts, DoReMi/DSIR-style mixture tuning starts from a
domain x (docs, tokens, quality) table, and a crawler reprioritizes
hosts by yield. The reference engine prints only global per-round
counters (crawler.cc stats printout); the per-host rollup is
pipeline-brief scope.

Columns per host: document count, byte/token mass, mean doc length
(exact millipoints), language mode (deterministic tie-break), distinct
languages, and the within-host exact-duplicate count — the "is this
domain a template farm" signal.

Exactness notes: the language mode avoids engine-specific arg-max
semantics by max()-ing a sortable ``lpad(count)||lang`` string (ties
break toward the lexicographically larger language in BOTH engines);
means are integer millipoints.

Scale shape: two host-keyed aggregations (per-(host,lang) counts,
then per-host rollup) plus one count-distinct of 16-byte digests —
all map-side combined, document text reduced to digest/length in the
scan projection. Host cardinality output (~10^7 rows at web scale)
is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKENS = "size(filter(split(text, ' '), x -> x <> ''))"
_TOKENS_DUCK = "len(list_filter(string_split(text, ' '), x -> x <> ''))"


def host_report(
    docs: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """-> (dup_docs, host, mean_chars_milli, n_docs, n_langs, top_lang,
    top_lang_docs, total_chars, total_tokens) per host."""
    base = docs.selectExpr(
        f"{host_col} AS host",
        f"{lang_col} AS lang",
        f"CAST(length({text_col}) AS BIGINT) AS n_chars",
        f"CAST({_TOKENS.replace('text', text_col)} AS BIGINT) AS n_tokens",
        f"md5({text_col}) AS digest",
    )
    per_lang = base.groupBy("host", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("lang_docs")
    )
    top = per_lang.groupBy("host").agg(
        F.max(F.expr("lpad(CAST(lang_docs AS STRING), 12, '0') || lang")).alias("_top"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
    )
    per_host = base.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.count(F.lit(1)) - F.countDistinct("digest")).cast("long").alias("dup_docs"),
    )
    return per_host.join(top, "host").selectExpr(
        "dup_docs",
        "host",
        "(total_chars * 1000) div n_docs AS mean_chars_milli",
        "n_docs",
        "n_langs",
        "substr(_top, 13) AS top_lang",
        "CAST(substr(_top, 1, 12) AS BIGINT) AS top_lang_docs",
        "total_chars",
        "total_tokens",
    )


def host_report_sql(docs_sql: str) -> str:
    """DuckDB twin over a (host, lang, text) subquery."""
    return f"""
WITH d AS ({docs_sql}),
base AS (
  SELECT host, lang, CAST(length(text) AS BIGINT) AS n_chars,
         CAST({_TOKENS_DUCK} AS BIGINT) AS n_tokens, md5(text) AS digest
  FROM d
),
per_lang AS (
  SELECT host, lang, CAST(count(*) AS BIGINT) AS lang_docs
  FROM base GROUP BY host, lang
),
top AS (
  SELECT host,
         max(lpad(CAST(lang_docs AS STRING), 12, '0') || lang) AS top_s,
         CAST(count(*) AS BIGINT) AS n_langs
  FROM per_lang GROUP BY host
),
per_host AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         CAST(count(*) - count(DISTINCT digest) AS BIGINT) AS dup_docs
  FROM base GROUP BY host
)
SELECT p.dup_docs, p.host,
       (p.total_chars * 1000) // p.n_docs AS mean_chars_milli,
       p.n_docs, t.n_langs,
       substr(t.top_s, 13) AS top_lang,
       CAST(substr(t.top_s, 1, 12) AS BIGINT) AS top_lang_docs,
       p.total_chars, p.total_tokens
FROM per_host p JOIN top t ON p.host = t.host
"""
