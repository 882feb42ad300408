"""Registered-domain (eTLD+1) extraction: the Public Suffix List
algorithm (publicsuffix.org/list/) as a relational plan.

The reference's politeness and host statistics key on the raw hostname
(Url.cc host slot); production crawl policy and corpus statistics key on
the REGISTERED domain — rate limits per site owner, per-domain dedup and
mixing weights (RefinedWeb §G.1 keys its blocklist this way), spam-farm
grouping. The PSL is the published convention for "one label below the
public suffix".

Algorithm (the PSL spec, verbatim semantics):
1. a rule matches when its labels are a right-aligned suffix of the
   host's labels; ``*`` matches exactly one label;
2. a matching EXCEPTION rule (``!www.ck``) prevails over everything and
   its public suffix is the rule minus its leftmost label;
3. otherwise the prevailing rule is the matching rule with the MOST
   labels (ties: exact beats wildcard — the list never ships ambiguous
   pairs, the tiebreak just makes the plan total);
4. no rule matches → the prevailing rule is ``*`` (the bare TLD);
5. registered_domain = public suffix plus one label; NULL when the host
   IS a public suffix.

RULES below is a small embedded subset of the PSL (a public data table,
the entities.py precedent) covering the structurally distinct rule
kinds; a full-list swap is a data refresh, not a code change.

Scale shape (10^9 distinct hosts): hosts explode into ≤ label-count
suffix candidates (hostnames have ~3-5 labels); each candidate joins the
BROADCAST rule table twice (exact form, wildcard form) — the PSL is
~10k rows, KB-scale. Prevailing-rule selection is a per-host window over
those ≤2·labels candidate rows (bounded, unskewed). No UDF, no driver
state; everything is whole-stage-codegen string/array expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (pattern, is_exception) — wildcard rules keep their '*.' spelling;
# exception rules are stored WITHOUT the '!' and flagged.
RULES: tuple[tuple[str, bool], ...] = (
    ("com", False), ("org", False), ("net", False), ("edu", False),
    ("gov", False), ("io", False), ("de", False), ("fr", False),
    ("jp", False), ("au", False), ("br", False), ("in", False),
    ("uk", False), ("co.uk", False), ("org.uk", False), ("ac.uk", False),
    ("gov.uk", False), ("com.au", False), ("net.au", False),
    ("org.au", False), ("co.jp", False), ("or.jp", False),
    ("ne.jp", False), ("com.br", False), ("co.in", False),
    ("github.io", False), ("blogspot.com", False),
    ("s3.amazonaws.com", False),
    ("ck", False), ("*.ck", False), ("www.ck", True),
)


def _rules_df(spark):
    rows = [
        (p, p.startswith("*."), exc, len(p.split(".")))
        for p, exc in RULES
    ]
    return spark.createDataFrame(
        rows, "pattern string, is_wild boolean, is_exc boolean, nlabels int"
    )


def registered_domain(hosts: DataFrame, host_col: str = "host") -> DataFrame:
    """→ (host, public_suffix, registered_domain): one row per input row
    of ``hosts``; registered_domain is NULL when the host is itself a
    public suffix. Hosts are lowercased and must be non-null (crawl
    hosts come from parsed URLs, which always carry one)."""
    spark = hosts.sparkSession
    rules = _rules_df(spark)
    h = hosts.select(F.lower(F.col(host_col)).alias("host")).withColumn(
        "_labels", F.split("host", r"\.")
    ).withColumn("_n", F.size("_labels"))
    # candidate suffixes: i = 1..n (1-based start label), exact + wild form
    cand = (
        h.select(
            "host", "_labels", "_n",
            F.posexplode(F.sequence(F.lit(1), F.col("_n"))).alias("_p", "i"),
        )
        .drop("_p")
        .withColumn(
            "suffix",
            F.array_join(F.slice("_labels", F.col("i"), F.col("_n") - F.col("i") + 1), "."),
        )
        .withColumn(
            "wild",
            F.when(
                F.col("i") < F.col("_n"),
                F.concat(
                    F.lit("*."),
                    F.array_join(
                        F.slice("_labels", F.col("i") + 1, F.col("_n") - F.col("i")), "."
                    ),
                ),
            ),
        )
    )
    r_exact = rules.filter("NOT is_wild")
    r_wild = rules.filter("is_wild")
    exact_m = cand.join(
        F.broadcast(r_exact), cand["suffix"] == r_exact["pattern"]
    ).select("host", "suffix", "is_exc", "nlabels", F.lit(0).alias("wildm"))
    wild_m = cand.join(
        F.broadcast(r_wild), cand["wild"] == r_wild["pattern"]
    ).select("host", "suffix", "is_exc", "nlabels", F.lit(1).alias("wildm"))
    matches = exact_m.unionByName(wild_m)
    w = Window.partitionBy("host").orderBy(
        F.col("is_exc").desc(),
        F.col("nlabels").desc(),
        F.col("wildm").asc(),
        F.col("suffix").asc(),
    )
    best = (
        matches.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select(
            "host",
            F.when(
                F.col("is_exc"),
                F.regexp_replace("suffix", r"^[^.]+\.", ""),
            ).otherwise(F.col("suffix")).alias("public_suffix"),
        )
    )
    out = h.select("host", "_labels", "_n").join(best, "host", "left").withColumn(
        "public_suffix",
        # PSL default rule '*': the bare TLD is the public suffix
        F.coalesce("public_suffix", F.element_at("_labels", -1)),
    )
    psl = F.size(F.split("public_suffix", r"\."))
    return out.select(
        "host",
        "public_suffix",
        F.when(
            F.col("_n") > psl,
            F.array_join(F.slice("_labels", F.col("_n") - psl, psl + 1), "."),
        ).alias("registered_domain"),
    )


def cap_per_domain(
    docs: DataFrame,
    cap: int,
    host_col: str = "host",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain balancing: keep at most ``cap`` documents per registered
    domain (the Gopher/C4 convention — one mega-site must not dominate
    the corpus mix). Selection is deterministic and order-free: docs
    rank by md5 of their id within their eTLD+1, so both engines keep
    the identical subset regardless of scan order.

    → (doc_id, registered_domain, dom_rank, keep). Hosts that ARE a
    public suffix (NULL registered domain) group under their own host
    string — they are real sites, not droppable artifacts.

    Scale shape: registered_domain's broadcast rule joins, then ONE
    shuffle on the domain key; the rank window is per-domain with a
    WindowGroupLimit pushdown (rank ≤ cap prunes map-side), so a
    10^8-page domain contributes cap survivors without a full sort of
    its partition reaching the reducer.
    """
    rd = registered_domain(
        docs.select(F.col(host_col).alias("host")).distinct()
    )
    d = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        F.lower(F.col(host_col)).alias("host"),
    ).join(rd, "host")
    dom = F.coalesce("registered_domain", "host")
    w = Window.partitionBy(dom).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return d.select(
        id_col,
        dom.alias("registered_domain"),
        F.row_number().over(w).cast("long").alias("dom_rank"),
    ).withColumn("keep", F.col("dom_rank") <= cap)


def cap_per_domain_sql(docs_sql: str, cap: int) -> str:
    """DuckDB twin over any (doc_id, host) relation."""
    return f"""
WITH d AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, lower(host) AS host
  FROM ( {docs_sql} )
),
rd AS MATERIALIZED (
  {registered_domain_sql("SELECT DISTINCT host FROM d")}
),
ranked AS (
  SELECT d.doc_id,
         coalesce(rd.registered_domain, d.host) AS registered_domain,
         CAST(row_number() OVER (
           PARTITION BY coalesce(rd.registered_domain, d.host)
           ORDER BY md5(CAST(d.doc_id AS VARCHAR)) ASC, d.doc_id ASC
         ) AS BIGINT) AS dom_rank
  FROM d JOIN rd ON d.host = rd.host
)
SELECT doc_id, registered_domain, dom_rank, dom_rank <= {cap} AS keep
FROM ranked
"""


def registered_domain_sql(hosts_sql: str) -> str:
    """DuckDB twin over any relation with a ``host`` column: the same
    candidate explode, broadcast-shaped rule joins, window selection."""
    rule_rows = ", ".join(
        f"('{p}', {str(p.startswith('*.')).upper()}, "
        f"{str(exc).upper()}, {len(p.split('.'))})"
        for p, exc in RULES
    )
    return f"""
WITH rules(pattern, is_wild, is_exc, nlabels) AS ( VALUES {rule_rows} ),
h AS MATERIALIZED (
  SELECT lower(host) AS host, string_split(lower(host), '.') AS labels,
         len(string_split(lower(host), '.')) AS n
  FROM ( {hosts_sql} )
),
cand AS MATERIALIZED (
  SELECT host, labels, n, i,
         array_to_string(list_slice(labels, i, n), '.') AS suffix,
         CASE WHEN i < n THEN '*.' ||
              array_to_string(list_slice(labels, i + 1, n), '.') END AS wild
  FROM (SELECT host, labels, n, unnest(generate_series(1, n)) AS i FROM h)
),
matches AS (
  SELECT c.host, c.suffix, r.is_exc, r.nlabels, 0 AS wildm
  FROM cand c JOIN rules r ON c.suffix = r.pattern AND NOT r.is_wild
  UNION ALL
  SELECT c.host, c.suffix, r.is_exc, r.nlabels, 1 AS wildm
  FROM cand c JOIN rules r ON c.wild = r.pattern AND r.is_wild
),
best AS (
  SELECT host,
         CASE WHEN is_exc THEN regexp_replace(suffix, '^[^.]+\\.', '')
              ELSE suffix END AS public_suffix
  FROM (
    SELECT host, suffix, is_exc,
           row_number() OVER (
             PARTITION BY host
             ORDER BY is_exc DESC, nlabels DESC, wildm ASC, suffix ASC
           ) AS rn
    FROM matches
  ) WHERE rn = 1
)
SELECT h.host,
       coalesce(b.public_suffix, labels[n]) AS public_suffix,
       CASE WHEN n > len(string_split(coalesce(b.public_suffix, labels[n]), '.'))
            THEN array_to_string(list_slice(
                   labels,
                   n - len(string_split(coalesce(b.public_suffix, labels[n]), '.')),
                   n), '.')
       END AS registered_domain
FROM h LEFT JOIN best b ON h.host = b.host
"""
