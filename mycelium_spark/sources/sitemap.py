"""Sitemap ingestion: robots `Sitemap:` directives -> sitemapindex ->
urlset entries, as frontier seed material.

Every production crawler seeds its frontier from sitemaps (the
sitemaps.org protocol: robots.txt advertises sitemap URLs; a sitemap is
either a `<urlset>` of `<url>` entries carrying loc / lastmod /
changefreq / priority, or a `<sitemapindex>` of child sitemap locs —
and per the protocol an index may only list plain sitemaps, never
another index, so one expansion level is spec-complete). The reference
engine seeds only from an explicit URL list
(/root/reference/src/crawler/crawler.cc seed loop) and never reads
robots beyond allow/deny rules (Robots.cc), so sitemap discovery is
pipeline-brief scope here.

Parsing is deliberately regex-per-block, not a full XML parser: sitemap
files are machine-generated, the four fields sit in flat leaf tags, and
a `split(body, '</url>')` + `regexp_extract` pair keeps the whole parse
inside whole-stage codegen — no Python, no shuffle, one pass per body.
Real-world tolerance handled: whitespace inside `<loc>`, case-odd
`sitemap:` directive keys, missing lastmod/changefreq/priority,
non-W3C lastmod garbage (-> ''), and priorities parsed as exact
millipoints (integer arithmetic on the digit groups, no float).

Scale shape: directive extraction is a per-row line explode (bounded by
robots.txt size); matching advertised sitemap URLs against the fetched
pages corpus is ONE equi-join on url per level (two levels total —
directive targets, then index children), AQE-handled; block parsing is
per-row JVM. Nothing here shuffles document bodies except the join that
routes each sitemap body to its parse — and those bodies are sitemap
files (<=50 MB per protocol), not page HTML.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (?i) inline flag + no lookaround: identical semantics in Java regex
# (Spark) and RE2 (DuckDB oracle) — the PII-parity rule.
_DIRECTIVE_RE = r"(?i)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"
_LOC_RE = r"<loc>([^<]*)</loc>"
_LASTMOD_RE = r"<lastmod>([^<]*)</lastmod>"
_CHANGEFREQ_RE = r"<changefreq>([^<]*)</changefreq>"
_PRIORITY_RE = r"<priority>\s*([01])(?:\.([0-9]{1,3}))?\s*</priority>"


def sitemap_directives(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """-> distinct (host, sitemap_url) from `Sitemap:` robots lines."""
    return (
        robots.select(
            F.col(host_col).alias("host"),
            F.explode(F.split(F.col(body_col), "\n")).alias("_line"),
        )
        .select(
            "host",
            F.trim(F.regexp_extract("_line", _DIRECTIVE_RE, 1)).alias("sitemap_url"),
        )
        .filter(F.col("sitemap_url") != "")
        .distinct()
    )


def _parse_blocks(tagged: DataFrame, tag: str) -> DataFrame:
    """Explode one sitemap body into per-entry field rows.

    `tagged` carries (host, sitemap_url, body) already filtered to the
    root element matching `tag` ('url' under <urlset>, 'sitemap' under
    <sitemapindex>)."""
    blk = (
        tagged.select(
            "host",
            "sitemap_url",
            F.explode(F.split(F.col("body"), f"</{tag}>")).alias("_blk"),
        )
        .select(
            "host",
            "sitemap_url",
            F.trim(F.regexp_extract("_blk", _LOC_RE, 1)).alias("loc"),
            F.trim(F.regexp_extract("_blk", _LASTMOD_RE, 1)).alias("_lm"),
            F.lower(F.trim(F.regexp_extract("_blk", _CHANGEFREQ_RE, 1))).alias(
                "changefreq"
            ),
            F.regexp_extract("_blk", _PRIORITY_RE, 1).alias("_p1"),
            F.regexp_extract("_blk", _PRIORITY_RE, 2).alias("_p2"),
        )
        .filter(F.col("loc") != "")
    )
    return blk.select(
        "host",
        "sitemap_url",
        "loc",
        F.expr(
            r"CASE WHEN _lm rlike '^\\d{4}-\\d{2}-\\d{2}' "
            "THEN substr(_lm, 1, 10) ELSE '' END"
        ).alias("lastmod_day"),
        "changefreq",
        # exact millipoints: '0.85' -> 850, '1.0' -> 1000, absent -> -1;
        # integer arithmetic on the digit groups, never a float parse
        F.expr(
            "CAST(CASE WHEN _p1 = '' THEN -1 ELSE CAST(_p1 AS BIGINT) * 1000 "
            "+ CASE WHEN _p2 = '' THEN 0 ELSE CAST(rpad(_p2, 3, '0') AS BIGINT) END "
            "END AS BIGINT)"
        ).alias("priority_milli"),
    )


def parse_sitemap_pages(level: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split one level of fetched sitemap bodies into (url entries,
    index children). `level` is (host, sitemap_url, body)."""
    urls = _parse_blocks(level.filter(F.col("body").rlike("<urlset")), "url")
    kids = _parse_blocks(level.filter(F.col("body").rlike("<sitemapindex")), "sitemap")
    return urls, kids


def sitemap_seeds(
    robots: DataFrame,
    pages: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    url_col: str = "url",
    page_body_col: str = "body",
) -> DataFrame:
    """Full discovery pipeline: robots directives -> fetched sitemap
    bodies -> one spec-complete index expansion -> urlset entries.

    -> (changefreq, host, lastmod_day, loc, priority_milli, sitemap_url)
    rows, one per <url> entry per sitemap that lists it. Feed `loc`
    through url.normalize + the seen anti-join to enter the frontier.
    """
    p = pages.select(
        F.col(url_col).alias("_page_url"), F.col(page_body_col).alias("body")
    )
    d = sitemap_directives(robots, host_col, body_col)
    level0 = d.join(p, d.sitemap_url == p._page_url).select(
        "host", "sitemap_url", "body"
    )
    urls0, kids = parse_sitemap_pages(level0)
    child_refs = kids.select("host", F.col("loc").alias("sitemap_url")).distinct()
    level1 = child_refs.join(p, child_refs.sitemap_url == p._page_url).select(
        "host", "sitemap_url", "body"
    )
    urls1, _ = parse_sitemap_pages(level1)
    out = urls0.unionByName(urls1)
    # alphabetical column order, non-null throughout (driver-hash rule)
    return out.select(
        "changefreq", "host", "lastmod_day", "loc", "priority_milli", "sitemap_url"
    )


def sitemap_seeds_sql(robots_sql: str, pages_sql: str) -> str:
    """DuckDB twin of `sitemap_seeds` over (host, body) robots and
    (url, body) pages subqueries."""
    fields = f"""
        trim(regexp_extract(blk, '{_LOC_RE}', 1)) AS loc,
        trim(regexp_extract(blk, '{_LASTMOD_RE}', 1)) AS lm,
        lower(trim(regexp_extract(blk, '{_CHANGEFREQ_RE}', 1))) AS changefreq,
        regexp_extract(blk, '{_PRIORITY_RE}', 1) AS p1,
        regexp_extract(blk, '{_PRIORITY_RE}', 2) AS p2"""
    return f"""
WITH robots AS ({robots_sql}),
p AS ({pages_sql}),
d AS (
  SELECT DISTINCT host, trim(regexp_extract(line, '{_DIRECTIVE_RE}', 1)) AS sitemap_url
  FROM (SELECT host, unnest(string_split(body, chr(10))) AS line FROM robots)
  WHERE trim(regexp_extract(line, '{_DIRECTIVE_RE}', 1)) <> ''
),
l0 AS (
  SELECT d.host, d.sitemap_url, p.body FROM d JOIN p ON p.url = d.sitemap_url
),
b0 AS (
  SELECT host, sitemap_url, unnest(string_split(body, '</url>')) AS blk
  FROM l0 WHERE regexp_matches(body, '<urlset')
),
i0 AS (
  SELECT host, sitemap_url, unnest(string_split(body, '</sitemap>')) AS blk
  FROM l0 WHERE regexp_matches(body, '<sitemapindex')
),
kids AS (
  SELECT DISTINCT host, trim(regexp_extract(blk, '{_LOC_RE}', 1)) AS child
  FROM i0 WHERE trim(regexp_extract(blk, '{_LOC_RE}', 1)) <> ''
),
l1 AS (
  SELECT kids.host, kids.child AS sitemap_url, p.body
  FROM kids JOIN p ON p.url = kids.child
),
b1 AS (
  SELECT host, sitemap_url, unnest(string_split(body, '</url>')) AS blk
  FROM l1 WHERE regexp_matches(body, '<urlset')
),
e AS (
  SELECT host, sitemap_url, {fields}
  FROM (SELECT * FROM b0 UNION ALL SELECT * FROM b1)
)
SELECT changefreq, host,
       CASE WHEN regexp_matches(lm, '^\\d{{4}}-\\d{{2}}-\\d{{2}}')
            THEN substr(lm, 1, 10) ELSE '' END AS lastmod_day,
       loc,
       CAST(CASE WHEN p1 = '' THEN -1 ELSE CAST(p1 AS BIGINT) * 1000
            + CASE WHEN p2 = '' THEN 0
                   ELSE CAST(rpad(p2, 3, '0') AS BIGINT) END
            END AS BIGINT) AS priority_milli,
       sitemap_url
FROM e WHERE loc <> ''
"""
