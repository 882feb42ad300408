"""PII redaction — the standard training-data scrubbing stage (the
BigScience ROOTS pipeline's regex redaction, Laurençon et al. 2022 §3;
CCNet ships the same shape): emails, IPv4 addresses, and phone-shaped
digit runs are replaced with sentinel tokens, with per-document match
counts for pipeline telemetry.

Patterns are deliberately conservative REGULAR expressions with no
lookaround, so Spark's Java regex engine and DuckDB's RE2 match
identically (both leftmost-first; the classes below have no
backtracking-divergent constructs). Redaction order is fixed — email →
IPv4 → phone — because the pattern domains overlap (an email contains
dot-separated runs; an IPv4 is a digit run): both engines apply the same
order, so composed output is identical.

Scale shape: pure per-row JVM/regex expressions — no shuffle, no UDF,
trivially partition-parallel at any corpus size; the three
regexp_replace passes fuse into one whole-stage-codegen projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d().-]{6,}\d"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, redacted_text, n_emails, n_ips, n_phones)."""
    t = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
    step1 = F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)
    n_ips = F.size(F.regexp_extract_all(step1, F.lit(IPV4_RE), F.lit(0)))
    step2 = F.regexp_replace(step1, IPV4_RE, IP_TOKEN)
    n_phones = F.size(F.regexp_extract_all(step2, F.lit(PHONE_RE), F.lit(0)))
    step3 = F.regexp_replace(step2, PHONE_RE, PHONE_TOKEN)
    return docs.select(
        id_col,
        step3.alias("redacted_text"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
    )


def pii_scrub_sql(source: str = "documents") -> str:
    """DuckDB twin: same patterns, same email → IPv4 → phone order."""
    return f"""
WITH s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
         regexp_replace(text, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g') AS t1
  FROM {source}
), s2 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(t1, '{IPV4_RE}')) AS BIGINT) AS n_ips,
         regexp_replace(t1, '{IPV4_RE}', '{IP_TOKEN}', 'g') AS t2
  FROM s1
)
SELECT doc_id,
       regexp_replace(t2, '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS redacted_text,
       n_emails, n_ips,
       CAST(len(regexp_extract_all(t2, '{PHONE_RE}')) AS BIGINT) AS n_phones
FROM s2
"""
