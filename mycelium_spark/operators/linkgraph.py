"""Link-graph analysis: PageRank for crawl prioritization.

The reference crawler emits a link stream (each fetched page's out-links,
/root/reference/src/crawler/crawler.cc link handling; our S10 sink in
plans/crawl.py writes the same (src_url, dst_url) rows). The canonical
consumer of that stream is a host-authority score that orders the
frontier — PageRank (Page et al. 1999) is the published convention, and
the reference's own TODO list stops at the link sink, so the scoring
step is pipeline-brief scope here.

Semantics (classic power iteration, FIXED iteration count so the run is
deterministic and SQL-unrollable):

* edges are DISTINCT (src, dst) pairs — multiplicity does not weight;
  self-loops are legal and treated like any edge;
* rank0(v) = 1/N; rank_{i+1}(v) = (1-d)/N + d * Σ_{u→v} rank_i(u)/outdeg(u);
* dangling nodes (no out-edges) leak their mass — the original
  formulation without the dangling-redistribution term, chosen because
  redistribution needs a per-iteration GLOBAL scalar (a driver round-trip
  per iteration at cluster scale) and identical leak semantics are easy
  to pin in both engines. Rank sums then total < 1 when danglings exist.

Determinism (the driver value-hash gate): the whole fixed point runs in
INTEGER units of 1e-12 (BIGINT). Double `round()` tie behavior differs
between engines (Spark's BigDecimal HALF_UP vs DuckDB's scaled-double
rounding flipped the 12th digit on real graphs), but floor division of
non-negative BIGINTs is bit-identical in Spark (`div`), DuckDB (`//`)
and Python (`//`). Damping is quantized to thousandths (0.85 → 850);
each step is  r' = (SCALE*(1000-dm)/1000)/N + dm*Σ(r/outdeg)/1000  with
every `/` a floor division. Only the final scaled→double conversion
touches floats, and it is the same single IEEE op on the same integers
in both engines.

Scale shape (10^9-host web graph): each iteration is one equi-join of
the edge table (pre-joined with out-degrees, checkpointed once) against
the O(N) rank table keyed by src, one map-side-combined groupBy dst, and
one left join back to the node list — all key-hashed shuffles over O(E)
/ O(N) rows; no broadcast of anything rank-sized, no global window, no
driver state. ``localCheckpoint`` per iteration truncates lineage (the
round-1 iterative-loop lesson); a real cluster would use
``spark.checkpoint`` for executor-loss recovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ITERS_DEFAULT = 5
DAMPING_DEFAULT = 0.85
SCALE = 10**12  # rank fixed-point: 1.0 == 10^12


def pagerank(
    edges: DataFrame,
    iters: int = ITERS_DEFAULT,
    damping: float = DAMPING_DEFAULT,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """→ (node, rank) for every node in the graph after ``iters``
    power-iteration steps. ``edges`` is any (src, dst) relation; pairs
    are deduplicated here. ``damping`` is quantized to thousandths."""
    dm = round(damping * 1000)
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    odeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # contributions need rank/outdeg per source: pre-join degrees into the
    # edge table ONCE and checkpoint — the loop re-reads materialized rows
    eo = e.join(odeg, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # bounded driver scalar (node count), like the
    # 256-bucket offsets in sampling: O(1) rows, not corpus-sized
    base = (SCALE * (1000 - dm) // 1000) // n  # all-integer, floor
    r = nodes.withColumn("r", F.lit(SCALE // n).cast("long"))
    for _ in range(iters):
        contrib = (
            eo.join(r.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("r div outdeg")).alias("_s"))
        )
        r = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({dm} * coalesce(_s, 0L)) div 1000")
                ).alias("r"),
            )
            # lazy: nothing forces it until the caller acts; lineage still
            # truncates so plan depth stays O(1) per iteration
            .localCheckpoint(eager=False)
        )
    return r.select(
        "node", (F.col("r").cast("double") / F.lit(float(SCALE))).alias("rank")
    )


def pagerank_sql(
    edges_sql: str,
    iters: int = ITERS_DEFAULT,
    damping: float = DAMPING_DEFAULT,
) -> str:
    """DuckDB twin: the same all-integer fixed-point arithmetic with the
    iterations unrolled as chained CTEs (r0 → r{iters})."""
    dm = round(damping * 1000)
    base_num = SCALE * (1000 - dm) // 1000
    parts = [
        # dedupe HERE, like the Spark side — multiplicity must not weight
        f"edges AS ( SELECT DISTINCT src, dst FROM ( {edges_sql} ) )",
        "odeg AS ( SELECT src, count(*) AS outdeg FROM edges GROUP BY src )",
        "nodes AS ( SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) )",
        "nn AS ( SELECT count(*) AS n FROM nodes )",
        f"r0 AS ( SELECT node, {SCALE} // (SELECT n FROM nn) AS r FROM nodes )",
    ]
    for i in range(iters):
        parts.append(
            f"c{i} AS ( SELECT e.dst AS node, sum(r.r // o.outdeg) AS s "
            f"FROM edges e JOIN r{i} r ON e.src = r.node "
            f"JOIN odeg o ON e.src = o.src GROUP BY e.dst )"
        )
        parts.append(
            f"r{i + 1} AS ( SELECT n.node, "
            f"{base_num} // (SELECT n FROM nn) "
            f"+ ({dm} * coalesce(c.s, 0)) // 1000 AS r "
            f"FROM nodes n LEFT JOIN c{i} c ON n.node = c.node )"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, CAST(r AS DOUBLE) / {float(SCALE)!r} AS rank"
        + f" FROM r{iters}"
    )


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = ITERS_DEFAULT,
    damping: float = DAMPING_DEFAULT,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina & Pedersen, VLDB 2004):
    PageRank with the teleport vector restricted to a curated good-seed
    set, so trust flows OUT of vetted hosts and link farms — reachable
    mostly from each other — starve. The spam complement of the
    linkspam feature pass: features flag candidates, trust propagation
    scores the graph.

    Same all-integer fixed point as :func:`pagerank` (the engines'
    double round() tie divergence motivated it there); the only deltas
    are the seed-restricted initial vector and teleport term:
    r0 = SCALE/S on seeds else 0;  r' = is_seed*(SCALE*(1-d))/S
    + d * sum(contrib). Dangling mass leaks, as in pagerank.

    Scale shape: identical to pagerank (the seed flag rides the node
    table; seeds are dimension-sized but never broadcast — one
    left-join marks the flag).
    """
    dm = round(damping * 1000)
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct()
    odeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    eo = e.join(odeg, "src").localCheckpoint(eager=True)
    sd = seeds.select(F.col(seed_col).cast("long").alias("node")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(sd.withColumn("_seed", F.lit(1)), "node", "left")
        .select("node", F.coalesce("_seed", F.lit(0)).alias("is_seed"))
        .localCheckpoint(eager=True)
    )
    s = nodes.filter("is_seed = 1").count()  # bounded driver scalar
    if s == 0:
        return nodes.select("node", F.lit(0.0).alias("trust"))
    base = (SCALE * (1000 - dm) // 1000) // s
    r = nodes.withColumn(
        "r", F.expr(f"CAST(is_seed * ({SCALE} div {s}) AS BIGINT)")
    )
    for _ in range(iters):
        contrib = (
            eo.join(r.selectExpr("node AS src", "r"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("r div outdeg")).alias("_s"))
        )
        r = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                "is_seed",
                F.expr(
                    f"is_seed * {base} + ({dm} * coalesce(_s, 0L)) div 1000"
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return r.select(
        "node", (F.col("r").cast("double") / F.lit(float(SCALE))).alias("trust")
    )


def trustrank_sql(
    edges_sql: str,
    seeds_sql: str,
    iters: int = ITERS_DEFAULT,
    damping: float = DAMPING_DEFAULT,
) -> str:
    """DuckDB twin of :func:`trustrank`, iterations unrolled."""
    dm = round(damping * 1000)
    base_num = SCALE * (1000 - dm) // 1000
    parts = [
        f"edges AS ( SELECT DISTINCT src, dst FROM ( {edges_sql} ) )",
        "odeg AS ( SELECT src, count(*) AS outdeg FROM edges GROUP BY src )",
        f"sd AS ( SELECT DISTINCT node FROM ( {seeds_sql} ) )",
        "nodes AS ( SELECT n.node, "
        "CASE WHEN sd.node IS NOT NULL THEN 1 ELSE 0 END AS is_seed "
        "FROM (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)) n "
        "LEFT JOIN sd ON n.node = sd.node )",
        "ns AS ( SELECT count(*) AS s FROM nodes WHERE is_seed = 1 )",
        f"r0 AS ( SELECT node, is_seed, "
        f"is_seed * ({SCALE} // (SELECT s FROM ns)) AS r FROM nodes )",
    ]
    for i in range(iters):
        parts.append(
            f"c{i} AS ( SELECT e.dst AS node, sum(r.r // o.outdeg) AS s "
            f"FROM edges e JOIN r{i} r ON e.src = r.node "
            f"JOIN odeg o ON e.src = o.src GROUP BY e.dst )"
        )
        parts.append(
            f"r{i + 1} AS ( SELECT n.node, n.is_seed, "
            f"n.is_seed * ({base_num} // (SELECT s FROM ns)) "
            f"+ ({dm} * coalesce(c.s, 0)) // 1000 AS r "
            f"FROM nodes n LEFT JOIN c{i} c ON n.node = c.node )"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, CAST(r AS DOUBLE) / {float(SCALE)!r} AS trust"
        + f" FROM r{iters}"
    )
