"""Crawl-trap (spider-trap) URL detection.

Crawlers that follow links blindly drown in infinite URL spaces:
session ids minted per request, calendars paging forever, path loops
(``/cat/page/cat/page/...``) from relative-link bugs, and
parameter-explosion faceted search. The classic mitigation (Heydon &
Najork's Mercator; IRLbot's spam/trap budgeeting) is a cheap per-URL
structural gate applied before the frontier accepts a candidate. The
reference engine filters candidates only by scheme and robots rules
(/root/reference/src/crawler/crawler.cc candidate gate), so trap
detection is pipeline-brief scope: at 10^10-URL frontier scale, traps
are the difference between crawling the web and crawling one broken
site forever.

Signals (each an integer/boolean per-row expression — the whole gate
is one whole-stage-codegen projection, no shuffle, no Python):

* ``max_seg_repeat`` — the highest occurrence count of any single path
  segment (loop traps);
* ``path_depth`` — number of non-empty path segments;
* ``query_len`` / ``n_params`` — query-string bloat (faceted search);
* session-id markers in path params or query (``;jsessionid=`` etc.);
* ``n_numeric_segs`` — all-digit path segments (calendar/pagination
  traps).

``reason`` is first-failing-rule in a fixed order (the Gopher-filter
convention used across this repo), '' when the URL is clean;
``trap = reason <> ''``.

Scale shape: per-row only — compose it into the candidate pipeline
BEFORE the seen anti-join so trap URLs never reach the Bloom filter or
the frontier shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_SEG_REPEAT_DEFAULT = 3  # trap when any segment occurs >= this
MAX_DEPTH_DEFAULT = 12  # trap when more path segments than this
MAX_QUERY_LEN_DEFAULT = 256
MAX_PARAMS_DEFAULT = 10
MAX_NUMERIC_SEGS_DEFAULT = 4  # trap when >= this many all-digit segments

_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)?"
_QUERY_RE = r"\?([^#]*)"
# lookaround-free, RE2/Java-identical (the PII-parity rule); the
# leading delimiter class keeps 'userid=' from matching 'sid='
_SESSION_RE = r"(?i)[;?&](jsessionid|phpsessid|cfid|cftoken|sessionid|session_id|sid)="


def _metric_exprs(url: str) -> dict[str, str]:
    """Spark SQL fragments for every trap signal over a URL column."""
    segs = (
        f"filter(split(regexp_extract({url}, '{_PATH_RE}', 1), '/'), s -> s <> '')"
    )
    # Spark SQL string literals process backslash escapes (DuckDB's do
    # not), so the regex backslash doubles on this side only
    query = f"regexp_extract({url}, '{_QUERY_RE.replace(chr(92), chr(92) * 2)}', 1)"
    return {
        "max_seg_repeat": (
            f"CAST(coalesce(array_max(transform(array_distinct({segs}), "
            f"s -> size(filter({segs}, x -> x = s)))), 0) AS BIGINT)"
        ),
        "path_depth": f"CAST(size({segs}) AS BIGINT)",
        "query_len": f"CAST(length({query}) AS BIGINT)",
        "n_params": (
            f"CAST(CASE WHEN {query} = '' THEN 0 "
            f"ELSE size(split({query}, '&')) END AS BIGINT)"
        ),
        "has_session_id": f"{url} rlike '{_SESSION_RE}'",
        "n_numeric_segs": (
            f"CAST(size(filter({segs}, s -> s rlike '^[0-9]+$')) AS BIGINT)"
        ),
    }


def _reason_sql(
    max_seg_repeat: int,
    max_depth: int,
    max_query_len: int,
    max_params: int,
    max_numeric_segs: int,
) -> str:
    return f"""CASE
        WHEN max_seg_repeat >= {max_seg_repeat} THEN 'repeated_segments'
        WHEN path_depth > {max_depth} THEN 'path_depth'
        WHEN query_len > {max_query_len} THEN 'query_length'
        WHEN n_params > {max_params} THEN 'param_count'
        WHEN has_session_id THEN 'session_id'
        WHEN n_numeric_segs >= {max_numeric_segs} THEN 'numeric_segments'
        ELSE '' END"""


def detect_traps(
    urls: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_seg_repeat: int = MAX_SEG_REPEAT_DEFAULT,
    max_depth: int = MAX_DEPTH_DEFAULT,
    max_query_len: int = MAX_QUERY_LEN_DEFAULT,
    max_params: int = MAX_PARAMS_DEFAULT,
    max_numeric_segs: int = MAX_NUMERIC_SEGS_DEFAULT,
) -> DataFrame:
    """-> (doc_id, max_seg_repeat, n_numeric_segs, n_params, path_depth,
    query_len, reason, trap) per URL row."""
    m = _metric_exprs(url_col)
    metrics = urls.selectExpr(
        id_col,
        *(f"{expr} AS {name}" for name, expr in m.items()),
    )
    reason = _reason_sql(
        max_seg_repeat, max_depth, max_query_len, max_params, max_numeric_segs
    )
    return metrics.selectExpr(
        id_col,
        "max_seg_repeat",
        "n_numeric_segs",
        "n_params",
        "path_depth",
        "query_len",
        f"{reason} AS reason",
    ).withColumn("trap", F.col("reason") != "")


def detect_traps_sql(
    urls_sql: str,
    max_seg_repeat: int = MAX_SEG_REPEAT_DEFAULT,
    max_depth: int = MAX_DEPTH_DEFAULT,
    max_query_len: int = MAX_QUERY_LEN_DEFAULT,
    max_params: int = MAX_PARAMS_DEFAULT,
    max_numeric_segs: int = MAX_NUMERIC_SEGS_DEFAULT,
) -> str:
    """DuckDB twin over a (doc_id, url) subquery: same regexes, list
    lambdas instead of Spark HOFs."""
    segs = (
        "list_filter(string_split(regexp_extract(url, "
        f"'{_PATH_RE}', 1), '/'), s -> s <> '')"
    )
    query = f"regexp_extract(url, '{_QUERY_RE}', 1)"
    reason = _reason_sql(
        max_seg_repeat, max_depth, max_query_len, max_params, max_numeric_segs
    )
    return f"""
WITH u AS ({urls_sql}),
m AS (
  SELECT doc_id,
    CAST(coalesce(list_max(list_transform(list_distinct({segs}),
      s -> len(list_filter({segs}, x -> x = s)))), 0) AS BIGINT) AS max_seg_repeat,
    CAST(len(list_filter({segs}, s -> regexp_matches(s, '^[0-9]+$')))
      AS BIGINT) AS n_numeric_segs,
    CAST(CASE WHEN {query} = '' THEN 0
         ELSE len(string_split({query}, '&')) END AS BIGINT) AS n_params,
    CAST(len({segs}) AS BIGINT) AS path_depth,
    CAST(length({query}) AS BIGINT) AS query_len,
    regexp_matches(url, '{_SESSION_RE}') AS has_session_id
  FROM u
)
SELECT doc_id, max_seg_repeat, n_numeric_segs, n_params, path_depth,
       query_len, {reason} AS reason, ({reason}) <> '' AS trap
FROM m
"""
