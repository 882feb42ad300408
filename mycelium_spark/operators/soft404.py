"""Soft-404 detection: error pages served with status 200.

A large fraction of dead URLs on the real web do not return 404 — the
server answers 200 with a "page not found" template (the *soft 404* of
Bar-Yossef et al., "Sic transit gloria telae", WWW 2004). A crawler
that trusts the status code indexes these husks, keeps them in the
frontier's refresh rotation, and feeds boilerplate to the training
corpus. The online detection of that paper (probe a random sibling
URL and compare) needs extra fetches; the standard offline corpus
pass — used here — scores the content itself. The reference engine
branches on the HTTP status alone (crawler.cc response handling), so
content-level soft-404 detection is pipeline-brief scope.

Signals, each a per-row JVM expression over (status, title, body
text):

* error phrases in the TITLE (weight 2 — templates almost always
  title the error): 'not found', '404', 'error', 'does not exist',
  'no longer available';
* error phrases in the BODY text (weight 1 each, presence not count);
* near-empty extracted text (< ``min_body_chars``, weight 1) — husk
  templates carry chrome but no content.

``soft404`` fires at ``score >= 2`` on pages whose HTTP status is
200 — a real 404/410 is already handled by the status machine and is
never a *soft* 404.

Scale shape: one codegen projection, no shuffle, no Python; compose
after extraction, before the document store write, so husks die
before they cost storage or index space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

TITLE_PHRASES = ("not found", "404", "error", "does not exist", "no longer available")
BODY_PHRASES = (
    "page not found",
    "does not exist",
    "no longer available",
    "been removed",
    "error 404",
)
MIN_BODY_CHARS_DEFAULT = 80
SCORE_THRESHOLD = 2


def _phrase_hits(col: str, phrases) -> str:
    terms = " + ".join(
        f"(CASE WHEN lower({col}) LIKE '%{p}%' THEN 1 ELSE 0 END)" for p in phrases
    )
    return f"CAST({terms} AS BIGINT)"


def detect_soft404(
    pages: DataFrame,
    status_col: str = "status",
    title_col: str = "title",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_body_chars: int = MIN_BODY_CHARS_DEFAULT,
) -> DataFrame:
    """-> (body_hits, body_len, doc_id, score, soft404, title_hits) per
    page row."""
    m = pages.selectExpr(
        f"{id_col} AS doc_id",
        f"CAST({status_col} AS BIGINT) AS status",
        f"{_phrase_hits(title_col, TITLE_PHRASES)} AS title_hits",
        f"{_phrase_hits(text_col, BODY_PHRASES)} AS body_hits",
        f"CAST(length({text_col}) AS BIGINT) AS body_len",
    )
    scored = m.selectExpr(
        "body_hits",
        "body_len",
        "doc_id",
        f"CAST(2 * CASE WHEN title_hits > 0 THEN 1 ELSE 0 END + body_hits "
        f"+ CASE WHEN body_len < {min_body_chars} THEN 1 ELSE 0 END "
        "AS BIGINT) AS score",
        "status",
        "title_hits",
    )
    return scored.selectExpr(
        "body_hits",
        "body_len",
        "doc_id",
        "score",
        # only a 200 can be a SOFT 404; real error statuses are the
        # status machine's business
        f"score >= {SCORE_THRESHOLD} AND status = 200 AS soft404",
        "title_hits",
    )


def detect_soft404_sql(
    pages_sql: str, min_body_chars: int = MIN_BODY_CHARS_DEFAULT
) -> str:
    """DuckDB twin over a (doc_id, status, title, text) subquery."""
    return f"""
WITH p AS ({pages_sql}),
m AS (
  SELECT doc_id, CAST(status AS BIGINT) AS status,
         {_phrase_hits('title', TITLE_PHRASES)} AS title_hits,
         {_phrase_hits('text', BODY_PHRASES)} AS body_hits,
         CAST(length(text) AS BIGINT) AS body_len
  FROM p
),
s AS (
  SELECT *, CAST(2 * CASE WHEN title_hits > 0 THEN 1 ELSE 0 END + body_hits
         + CASE WHEN body_len < {min_body_chars} THEN 1 ELSE 0 END
         AS BIGINT) AS score
  FROM m
)
SELECT body_hits, body_len, doc_id, score,
       (score >= {SCORE_THRESHOLD} AND status = 200) AS soft404,
       title_hits
FROM s
"""
