"""rel=canonical extraction and canonical-URL deduplication.

Duplicate URLs are the normal case on the web (tracking params, mobile
mirrors, pagination re-entries), and the site's own dedup hint is the
``<link rel="canonical" href=...>`` tag (Google/Bing/Yahoo joint
convention, RFC 6596). A crawler that ignores it refetches and
re-indexes every variant; one that honors it collapses each variant
group to the page the site designates. The reference engine dedups
only by exact URL-seen membership (crawler.cc seen set), so canonical
collapsing is pipeline-brief scope, composing directly with the A1
seen set and the dedup family.

Extraction is regex-per-row (the sitemap rule: machine-generated flat
tags; the first matching <link> tag wins, matching browser/bot
behavior), tolerant of attribute order (href before or after rel),
quote style, and whitespace. href resolution covers the absolute,
root-relative and protocol-relative forms as pure JVM string
expressions; other relative forms (vanishingly rare for canonical
tags, which SEO guidance says to emit absolute) resolve to '' and the
page falls back to self-canonical — the conservative choice: we never
collapse on a hint we could not resolve. RFC 3986 merge for those
stragglers lives in functions/url.merge_ref (F9) if a caller wants it.

Dedup semantics: the effective key is ``coalesce(canonical, url)``;
within a key group the survivor is the designated target when it is
itself in the corpus, else the lexicographically smallest member (a
deterministic stand-in for "first crawled").

Scale shape: extraction/resolution is one codegen projection; grouping
is one groupBy on the canonical key (map-side combined, key cardinality
= page count); survivor election needs no window — min(url) and a
bool-or of self-membership per group, then one equi-join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# two-step: grab the first canonical <link> tag, then its href. No
# lookaround; '' on no match in both Java regex and RE2.
_TAG_RE = """(?i)<link[^>]*rel=["']?canonical["']?[^>]*>"""
_HREF_RE = """(?i)href=["']?([^"' >]+)"""
_ORIGIN_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)"


def _resolve_sql(url: str, href: str) -> str:
    """Shared (Spark/DuckDB) CASE: absolute | protocol-relative |
    root-relative | unresolvable->''."""
    scheme = f"regexp_extract({url}, '{_ORIGIN_RE}', 1)"
    hostp = f"regexp_extract({url}, '{_ORIGIN_RE}', 2)"
    return f"""CASE
        WHEN {href} = '' THEN ''
        WHEN {href} LIKE 'http://%' OR {href} LIKE 'https://%' THEN {href}
        WHEN {href} LIKE '//%' THEN {scheme} || ':' || {href}
        WHEN {href} LIKE '/%' THEN {scheme} || '://' || {hostp} || {href}
        ELSE '' END"""


def canonical_links(
    pages: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """-> (canonical, url): resolved canonical target per page ('' when
    the page carries no resolvable hint)."""
    tag = f"regexp_extract({body_col}, '{_TAG_RE.replace(chr(39), chr(39) * 2)}', 0)"
    href = f"regexp_extract({tag}, '{_HREF_RE.replace(chr(39), chr(39) * 2)}', 1)"
    return pages.selectExpr(
        f"{_resolve_sql(url_col, href)} AS canonical", f"{url_col} AS url"
    )


def canonical_dedup(
    pages: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """-> (canon_key, group_size, survivor, url) per page: every URL
    tagged with its variant group and the group's elected survivor."""
    links = canonical_links(pages, url_col, body_col).select(
        F.when(F.col("canonical") == "", F.col("url"))
        .otherwise(F.col("canonical"))
        .alias("canon_key"),
        "url",
    )
    groups = links.groupBy("canon_key").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.min("url").alias("_min_url"),
        F.max((F.col("url") == F.col("canon_key")).cast("int")).alias("_self_in"),
    )
    return links.join(groups, "canon_key").select(
        "canon_key",
        "group_size",
        F.when(F.col("_self_in") == 1, F.col("canon_key"))
        .otherwise(F.col("_min_url"))
        .alias("survivor"),
        "url",
    )


def canonical_dedup_sql(pages_sql: str) -> str:
    """DuckDB twin over a (url, body) subquery."""
    tag = f"regexp_extract(body, '{_TAG_RE.replace(chr(39), chr(39) * 2)}', 0)"
    href = f"regexp_extract({tag}, '{_HREF_RE.replace(chr(39), chr(39) * 2)}', 1)"
    return f"""
WITH p AS ({pages_sql}),
links AS (
  SELECT CASE WHEN c = '' THEN url ELSE c END AS canon_key, url
  FROM (SELECT {_resolve_sql('url', href)} AS c, url FROM p)
),
groups AS (
  SELECT canon_key, CAST(count(*) AS BIGINT) AS group_size,
         min(url) AS min_url,
         max(CASE WHEN url = canon_key THEN 1 ELSE 0 END) AS self_in
  FROM links GROUP BY canon_key
)
SELECT l.canon_key, g.group_size,
       CASE WHEN g.self_in = 1 THEN l.canon_key ELSE g.min_url END AS survivor,
       l.url
FROM links l JOIN groups g ON l.canon_key = g.canon_key
"""


# ---------------------------------------------------------------------
# Tracking-parameter stripping → URL dedup keys
# ---------------------------------------------------------------------

# The cross-site tracking/click-id parameters every pipeline strips
# before URL-level dedup (the C4/CC convention — analytics params make
# every shared link a distinct URL without changing the content).
# Public, stable set: Google Analytics utm_*, Google/Microsoft/Facebook
# click ids, Mailchimp ids, Instagram share id.
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "igshid",
)


def dedup_key_expr(url: str, dialect: str = "spark") -> str:
    """One whole-stage-codegen expression producing the URL dedup key:
    fragment dropped, tracking params removed, surviving query params
    sorted (order variants collapse), '?' dropped when nothing remains.
    Scheme/host/path bytes are untouched — case and escaping belong to
    url_normalize (F1-F8), which composes BEFORE this.

    The param key is taken portably via instr/substr (array subscripts
    are 0-based in Spark SQL but 1-based in DuckDB — never index)."""
    key = (
        "lower(CASE WHEN instr(p, '=') > 0 "
        "THEN substr(p, 1, instr(p, '=') - 1) ELSE p END)"
    )
    inlist = ", ".join(f"'{t}'" for t in TRACKING_PARAMS)
    pred = f"p <> '' AND NOT {key} IN ({inlist})"
    if dialect == "spark":
        kept = f"array_sort(filter(split(q, '&'), p -> {pred}))"
        joined = f"array_join({kept}, '&')"
    else:
        kept = f"list_sort(list_filter(string_split(q, '&'), p -> {pred}))"
        # array_to_string of an EMPTY list is NULL in DuckDB (Spark's
        # array_join gives '') — coalesce or the no-survivor branch nulls
        joined = f"coalesce(array_to_string({kept}, '&'), '')"
    base = (
        f"CASE WHEN instr({url}, '#') > 0 "
        f"THEN substr({url}, 1, instr({url}, '#') - 1) ELSE {url} END"
    )
    return f"""(
  SELECT CASE WHEN q = '' THEN head
              WHEN {joined} = '' THEN head
              ELSE head || '?' || {joined} END
  FROM (
    SELECT CASE WHEN instr(b, '?') > 0 THEN substr(b, 1, instr(b, '?') - 1)
                ELSE b END AS head,
           CASE WHEN instr(b, '?') > 0 THEN substr(b, instr(b, '?') + 1)
                ELSE '' END AS q
    FROM (SELECT {base} AS b)
  )
)"""


def url_dedup_key(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """→ input + ``dedup_key``: the tracking-stripped, param-sorted,
    fragment-free key. Pure projection — no shuffle at any scale; the
    seen set / exact dedup keys on the result instead of the raw URL."""
    return pages.withColumn(
        "dedup_key", F.expr(dedup_key_expr(url_col, "spark"))
    )
