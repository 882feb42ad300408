"""URL filtering: domain blocklist + weighted keyword scoring.

The first stage of every published web-corpus pipeline is URL-level
filtering (RefinedWeb, Penedo et al. 2023 §G.1: a UT1-style domain
blocklist plus a weighted banned-word score over the URL string; C4
and Gopher do the same with smaller lists). The reference engine's
frontier filters only by scheme and robots rules
(/root/reference/src/crawler/crawler.cc scheme gate; Robots.cc), so
the content-policy gate is pipeline-brief scope here.

Semantics:

* the host is the authority of the URL, lowercased, port stripped;
* a URL is domain-blocked when its host equals a blocklist domain OR is
  a subdomain of one (``ads.example.com`` matches ``example.com``) —
  UT1 list convention;
* the keyword score is the sum of weights of banned words occurring as
  SUBSTRINGS of the lowercased URL (RefinedWeb's "strict" tier; their
  softer whole-word tier is the same expression over a second list);
  presence, not count — one hit per word;
* keep = not blocked and score < threshold. Integer weights, so the
  gate is float-free.

Scale shape (the reason this is not a LIKE-chain): the real UT1 list
is ~3M domains — too long to inline in an expression, small enough to
broadcast. Subdomain matching is a suffix match, which no hash join
does directly; each host is expanded into its ≤``max_labels`` dotted
suffixes (``a.b.c.example`` → itself, ``b.c.example``, ``c.example``,
``example``) and the explode equi-joins the broadcast blocklist — a
map-side join, no shuffle of the URL table. Keyword scoring is a
per-row JVM expression (bounded curated list, tens of words).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (word, weight) — benign stand-ins for the curated RefinedWeb list;
# presence of a word adds its weight once. Embedded as literals in both
# engines' plans, like LANG_PROFILES.
KW_WEIGHTS_DEFAULT: tuple[tuple[str, int], ...] = (
    ("casino", 3),
    ("poker", 2),
    ("pills", 2),
    ("webcam", 1),
    ("tracker", 1),
)
KW_MAX_DEFAULT = 3  # keep requires kw_score < this
MAX_LABELS_DEFAULT = 8  # suffix-expansion depth cap (DNS labels)

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"


def _kw_score_expr(url_lc: str, weights) -> str:
    terms = " + ".join(
        f"(CASE WHEN {url_lc} LIKE '%{w}%' THEN {wt} ELSE 0 END)" for w, wt in weights
    )
    return f"CAST({terms} AS BIGINT)"


def url_filter(
    urls: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    kw_weights=KW_WEIGHTS_DEFAULT,
    kw_max: int = KW_MAX_DEFAULT,
    max_labels: int = MAX_LABELS_DEFAULT,
) -> DataFrame:
    """→ (doc_id, host, blocked_domain, kw_score, keep) per URL row.

    ``blocklist`` is a (domain: string) relation — broadcast, so keep it
    dimension-sized (UT1 is ~3M rows ≈ tens of MB: fine)."""
    u = urls.select(
        F.col(id_col),
        F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1)).alias("host"),
        F.expr(_kw_score_expr(f"lower({url_col})", kw_weights)).alias("kw_score"),
    )
    sufs = u.select(
        id_col,
        F.expr(
            "transform(sequence(1, least(size(split(host, '\\\\.')), "
            f"{max_labels})), "
            "i -> array_join(slice(split(host, '\\\\.'), i, "
            "size(split(host, '\\\\.')) - i + 1), '.'))"
        ).alias("_sufs"),
    ).select(id_col, F.explode("_sufs").alias("_suf"))
    hits = (
        sufs.join(
            F.broadcast(blocklist.select(F.lower("domain").alias("_suf"))), "_suf"
        )
        .select(id_col)
        .distinct()
        .withColumn("blocked_domain", F.lit(True))
    )
    return (
        u.join(hits, id_col, "left")
        .select(
            id_col,
            "host",
            F.coalesce("blocked_domain", F.lit(False)).alias("blocked_domain"),
            "kw_score",
            (
                ~F.coalesce("blocked_domain", F.lit(False))
                & (F.col("kw_score") < F.lit(kw_max))
            ).alias("keep"),
        )
    )


def url_filter_sql(
    urls_sql: str,
    blocklist_sql: str,
    kw_weights=KW_WEIGHTS_DEFAULT,
    kw_max: int = KW_MAX_DEFAULT,
    max_labels: int = MAX_LABELS_DEFAULT,
) -> str:
    """DuckDB twin: same host extraction, suffix expansion (correlated
    EXISTS over the list — oracle-side only; the engine side is the
    broadcast equi-join) and keyword scoring.

    ``urls_sql`` yields (doc_id, url); ``blocklist_sql`` yields (domain)."""
    score = _kw_score_expr("lower(url)", kw_weights)
    return f"""
WITH urls AS ( {urls_sql} ),
block AS ( SELECT lower(domain) AS domain FROM ( {blocklist_sql} ) ),
u AS (
  SELECT doc_id,
         lower(regexp_extract(url, '{_HOST_RE}', 1)) AS host,
         {score} AS kw_score,
         list_transform(
           generate_series(1, least(len(string_split(
             lower(regexp_extract(url, '{_HOST_RE}', 1)), '.')), {max_labels})),
           i -> array_to_string(string_split(
             lower(regexp_extract(url, '{_HOST_RE}', 1)), '.')[i:], '.')
         ) AS sufs
  FROM urls
)
SELECT doc_id, host,
       EXISTS (SELECT 1 FROM block b WHERE list_contains(u.sufs, b.domain))
         AS blocked_domain,
       kw_score,
       (NOT EXISTS (SELECT 1 FROM block b WHERE list_contains(u.sufs, b.domain)))
         AND kw_score < {kw_max} AS keep
FROM u
"""
