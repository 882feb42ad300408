"""Archived-crawl ingestion plan: Common Crawl in, documents out.

The live-crawl plan (``plans/crawl.py``) replaces the reference's
libevent/curl loop (src/crawler/crawler.cc); this plan is its
archived-input twin — the path a 100 TB training pipeline actually
takes: the cc-index says WHERE every capture lives, ranged reads pull
exactly those WARC members, and the same byte-exact lexer that the
live fetch-join uses turns them into the documents table. End to end:

    CDXJ index  →  select_members (status/mime gate, digest dedup)
                →  fetch_members  (ranged reads, file-per-task)
                →  http_response_expr (pure-JVM envelope split)
                →  extract_frame  (the Arrow-batched html_lex UDF)

Extraction parity is pinned by test: a page ingested through this plan
yields text byte-identical to the same HTML pushed through the live
fetch-join path — the input_hint invariant holds across both ingest
modes.

Scale notes: the index scan is splittable text (filters on status/mime
push into it); the fetch stage's partitioning is by archive file so a
task's reads are sequential within one object; the envelope split and
lexer ride the same per-row/Arrow stages as the live path, so the two
ingest modes share every downstream operator unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import EXTRACT_TYPE, extract_frame
from ..sources import cdx, warc


def ingest_archive(
    spark: SparkSession,
    cdx_glob: str,
    warc_dir: str,
    status: int = 200,
    mime: str = "text/html",
) -> DataFrame:
    """cc-index + archive dir → (url, urlkey, digest, http_status, text,
    links); unreadable members are dropped (fetch_members stubs them
    with ``truncated`` — the live path's failure-stub convention covers
    live fetches only)."""
    plan = cdx.select_members(cdx.read_cdxj(spark, cdx_glob), status=status, mime=mime)
    recs = warc.fetch_members(
        plan.select("urlkey", "digest", "filename", "offset", "length"),
        base_dir=warc_dir,
    )
    r = warc.http_response_expr(F.col("payload"))
    pages = recs.filter(~F.col("truncated")).select(
        F.col("target_uri").alias("url"),
        "urlkey",
        "digest",
        r["http_status"].alias("http_status"),
        r["body"].alias("html"),
    )
    ex = F.pandas_udf(extract_frame, EXTRACT_TYPE)
    return pages.withColumn("e", ex("html", "url")).select(
        "url",
        "urlkey",
        "digest",
        "http_status",
        F.col("e.text").alias("text"),
        F.col("e.links").alias("links"),
    )
