"""CDX(J) index source + SURT canonicalization: the Common Crawl
index path.

Web archives ship a per-crawl URL index (the CDXJ format served by
pywb / Common Crawl's cc-index): one record per line,

    <urlkey> <timestamp> <json-block>

where ``urlkey`` is the SURT (Sort-friendly URI Reordering Transform)
form of the captured URL and the JSON block carries capture metadata
(``url mime status digest length offset filename``).  A 100 TB
pipeline reads this index to select WARC members *before* touching the
archives (offset/length point into the .warc.gz files — the published
random-access pattern), so both the line parser and the SURT key
function are first-class scan-side operators here.

Everything in this module is pure JVM (whole-stage-codegen string and
array expressions — no Python in the hot path):

* ``surt_key_expr`` — the Common Crawl ``urlkey`` canonicalization:
  lowercase, scheme + fragment dropped, ``www\\d*.`` prefix dropped,
  host labels reversed comma-joined, default ports dropped, query
  params sorted with empties removed;
* ``parse_cdxj`` — 2-split line framing + ``from_json`` metadata;
* ``read_cdxj`` — ``spark.read.text`` (gzip transparent) → parser.

Reference interplay: the reference crawls the live web and has no
archive-index reader; this is the archived-crawl equivalent of its
frontier scan (src/crawler/crawler.cc seed handling), keyed the way
the public index is actually published.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# CDXJ metadata block: all values are JSON strings in the published
# format; numeric fields are cast after parse.
CDXJ_META_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)


def surt_key_expr(url: Column) -> Column:
    """Common Crawl ``urlkey`` (SURT) canonical form of ``url``:

    ``HTTP://WWW2.Example.org:80/A/b?b=2&a=1&#frag`` →
    ``org,example)/a/b?a=1&b=2``

    Steps (the published canonicalizer's observable behavior):
    full lowercase; fragment dropped; scheme dropped; userinfo
    (``user:pass@``) dropped; leading
    ``www`` / ``www<digits>`` host label dropped; host labels reversed
    and comma-joined; ports 80/443 dropped, others kept (``host:8080``
    → ``org,example:8080)``); empty path → ``/``; query params sorted
    bytewise with empty params removed, ``?`` dropped when no params
    survive.
    """
    u = F.substring_index(F.lower(url), "#", 1)
    rest = F.regexp_replace(u, r"^https?://", "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    # the published canonicalizer drops userinfo (user:pass@host)
    hostport = F.substring_index(authority, "@", -1)
    rest_len_tail = F.substring(rest, F.length(authority) + 1, 1 << 30)
    pq = F.when(rest_len_tail == "", F.lit("/")).when(
        rest_len_tail.startswith("?"), F.concat(F.lit("/"), rest_len_tail)
    ).otherwise(rest_len_tail)
    host = F.substring_index(hostport, ":", 1)
    port = F.substring(hostport, F.length(host) + 2, 1 << 30)
    host_c = F.regexp_replace(host, r"^www\d*\.", "")
    rev = F.array_join(F.reverse(F.split(host_c, r"\.")), ",")
    port_part = F.when(port.isin("", "80", "443"), F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    path = F.substring_index(pq, "?", 1)
    query = F.substring(pq, F.length(path) + 2, 1 << 30)
    qsorted = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda x: x != "")), "&"
    )
    qpart = F.when(qsorted == "", F.lit("")).otherwise(F.concat(F.lit("?"), qsorted))
    return F.concat(rev, port_part, F.lit(")"), path, qpart)


def parse_cdxj(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """CDXJ lines → typed records.  The line grammar is two
    space-delimited tokens then the JSON block (which itself contains
    spaces — the 3-way limited split is the published framing).
    Malformed lines (missing JSON, bad JSON) survive as rows with null
    metadata rather than killing the scan."""
    parts = F.split(F.col(value_col), " ", 3)
    # F.get (not []) — ANSI mode raises on short (malformed) lines
    meta = F.from_json(F.get(parts, 2), CDXJ_META_SCHEMA)
    return lines.select(
        parts[0].alias("urlkey"),
        F.get(parts, 1).alias("timestamp"),
        meta["url"].alias("url"),
        meta["mime"].alias("mime"),
        meta["status"].cast("int").alias("status"),
        meta["digest"].alias("digest"),
        meta["length"].cast("long").alias("length"),
        meta["offset"].cast("long").alias("offset"),
        meta["filename"].alias("filename"),
    )


def read_cdxj(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed CDXJ read: text scan (gzip-transparent, splittable
    when uncompressed) → line parse."""
    return parse_cdxj(spark.read.text(path_glob))


def select_members(index: DataFrame, status: int = 200, mime: str = "text/html") -> DataFrame:
    """The standard pre-fetch selection: index rows → (filename, offset,
    length) WARC-member coordinates for matching captures, deduplicated
    by digest (identical captures across snapshots fetch once —
    EARLIEST capture wins, urlkey tie-break, so the plan is
    deterministic run-to-run).  The filter pushes into the index scan;
    the dedup is one shuffle keyed by digest; the output is the fetch
    plan a ranged-GET stage consumes."""
    from pyspark.sql import Window

    w = Window.partitionBy("digest").orderBy("timestamp", "urlkey")
    return (
        index.filter((F.col("status") == status) & (F.col("mime") == mime))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("urlkey", "url", "filename", "offset", "length", "digest")
    )
