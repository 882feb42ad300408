"""Term co-occurrence with PMI scoring (Church & Hanks 1990) — the
corpus-level term-association table behind related-terms suggestion,
query expansion and collocation extraction in a search stack. The
reference's index roadmap stops at postings (README.txt:25-27); this is
the first consumer of the postings-shaped (doc, term) relation beyond
retrieval itself.

Semantics (document-level presence, not positional windows):
* n_t  = number of docs containing term t (presence, not tf);
* vocabulary gate: min_df <= n_t <= max_df — hapaxes carry no signal
  and stopword-grade terms explode the pair space (the df cap is the
  SCALE lever: pairs per doc are O(v^2) in the doc's surviving
  vocabulary, so the cap bounds the quadratic);
* n_ab = number of docs containing BOTH (unordered, term_a < term_b),
  kept when n_ab >= min_pair;
* pmi  = ln((n_ab * N) / (n_a * n_b)) rounded 6 dp, computed as
  IEEE doubles in the same expression order in both engines (the
  integer products would overflow BIGINT near 10^9 docs).

Scale shape: the distinct (doc, term) projection and both counts are
map-side-combined groupBys; the pair generation is ONE doc-keyed
self-join of the df-gated melt (shuffle on doc_id; per-doc fan-out
bounded by the df cap as above); pair counting combines map-side. N is
one bounded driver scalar (the tf_idf precedent). No window, no
broadcast of anything corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = r"^\w+$"


def cooccurrence_pmi(
    docs: DataFrame,
    min_df: int = 2,
    max_df: int = 1 << 60,
    min_pair: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (term_a, term_b, n_a, n_b, n_ab, pmi) for unordered term pairs
    passing the df gates and the pair-count floor."""
    present = (
        docs.select(
            id_col, F.explode(F.split(F.col(text_col), " ")).alias("term")
        )
        .filter(F.col("term").rlike(_TOKEN_RE))
        .distinct()
    )
    n_docs = docs.select(id_col).distinct().count()  # bounded driver scalar
    dfreq = (
        present.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(
            (F.col("n") >= min_df) & (F.col("n") <= max_df)
        )
    )
    gated = present.join(dfreq, "term")  # (doc, term, n)
    x, y = gated.alias("x"), gated.alias("y")
    pairs = (
        x.join(y, F.col(f"x.{id_col}") == F.col(f"y.{id_col}"))
        .filter(F.col("x.term") < F.col("y.term"))
        .groupBy(
            F.col("x.term").alias("term_a"),
            F.col("y.term").alias("term_b"),
            F.col("x.n").alias("n_a"),
            F.col("y.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair)
    )
    pmi = F.round(
        F.log(
            (F.col("n_ab").cast("double") * F.lit(n_docs))
            / (F.col("n_a").cast("double") * F.col("n_b"))
        ),
        6,
    )
    return pairs.select("term_a", "term_b", "n_a", "n_b", "n_ab", pmi.alias("pmi"))


def cooccurrence_pmi_sql(
    min_df: int | str = 2,
    max_df: int | str = 1 << 60,
    min_pair: int | str = 2,
    source: str = "documents",
) -> str:
    """DuckDB twin over any (doc_id, text) relation. The three gates
    accept ints OR SQL fragments — corpus-relative gates (e.g.
    ``(6 * (SELECT n FROM nn)) // 100``) keep one oracle string valid
    at every scale factor (the driver runs sf0.01, the bench sf0.1)."""
    return f"""
WITH present AS MATERIALIZED (
  SELECT DISTINCT doc_id, term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM {source})
  WHERE regexp_full_match(term, '\\w+')
), nn AS ( SELECT count(DISTINCT doc_id) AS n FROM {source} ),
dfreq AS MATERIALIZED (
  SELECT term, CAST(count(*) AS BIGINT) AS n FROM present GROUP BY term
  HAVING count(*) >= ({min_df}) AND count(*) <= ({max_df})
), gated AS MATERIALIZED (
  SELECT p.doc_id, p.term, d.n FROM present p JOIN dfreq d ON p.term = d.term
)
SELECT term_a, term_b, n_a, n_b, n_ab,
       round(ln((CAST(n_ab AS DOUBLE) * (SELECT n FROM nn))
                / (CAST(n_a AS DOUBLE) * n_b)), 6) AS pmi
FROM (
  SELECT x.term AS term_a, y.term AS term_b, x.n AS n_a, y.n AS n_b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM gated x JOIN gated y ON x.doc_id = y.doc_id AND x.term < y.term
  GROUP BY x.term, y.term, x.n, y.n
) WHERE n_ab >= ({min_pair})
"""
