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


HITS_SCALE = 10**9  # hub/authority fixed point: 1.0 == 10^9. Chosen so
# the normalize step's product x*HITS_SCALE (x ≤ HITS_SCALE because
# edges are distinct and the source vector sums to ≤ HITS_SCALE) stays
# ≤ 10^18 < 2^63 — BIGINT-safe in both engines.


def hits(
    edges: DataFrame,
    iters: int = ITERS_DEFAULT,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS (Kleinberg, JACM 1999): mutually-reinforcing hub and
    authority scores over the S10 link stream — the directory-page /
    content-page decomposition PageRank's single score conflates.
    Complements pagerank/trustrank: same edge relation, same driver
    contract.

    Update (classic, with L1 normalization instead of Kleinberg's L2 —
    a documented variant that keeps the fixed point in integers; L2
    needs a sqrt of a global sum, which floor arithmetic can't carry
    bit-exactly across engines):

        a_i(v) = Σ_{u→v} h_{i-1}(u), then a ← a*SCALE // Σa
        h_i(u) = Σ_{u→v} a_i(v),     then h ← h*SCALE // Σh

    h_0 = SCALE // N. Edges are DISTINCT pairs; nodes with no
    out-edges get hub 0, no in-edges authority 0. All arithmetic is
    non-negative BIGINT floor division — bit-identical in Spark,
    DuckDB and Python (the pagerank lesson).

    The per-iteration L1 total is a genuinely global scalar. It is NOT
    collected at the driver: each total is a 1-row aggregate equi-joined
    back on a constant key with a broadcast hint, so the plan stays a
    BroadcastHashJoin of one row per iteration — no driver round-trip,
    no nested-loop join, cluster-safe. Everything else is the pagerank
    shuffle shape: O(E) equi-joins + map-side-combined groupBys,
    localCheckpoint per iteration to truncate lineage.
    """
    if iters < 1:
        raise ValueError("hits: iters must be >= 1")
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    ).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # bounded one-off driver scalar (pagerank precedent)

    def _normalize(raw: DataFrame) -> DataFrame:
        # raw feeds BOTH the total and the normalize probe: materialize it
        # first or each iteration doubles the recompute of everything
        # upstream (the union-branch trap — 2^(2·iters) by the last one)
        raw = raw.localCheckpoint(eager=False)
        tot = raw.agg(
            F.lit(1).alias("_k"), F.sum("r").cast("long").alias("_tot")
        )
        return (
            raw.withColumn("_k", F.lit(1))
            .join(F.broadcast(tot), "_k")
            .select(
                "node",
                F.expr(
                    f"CASE WHEN _tot = 0 THEN 0L "
                    f"ELSE (r * {HITS_SCALE}L) div _tot END"
                ).alias("r"),
            )
        )

    h = nodes.withColumn("r", F.lit(HITS_SCALE // n).cast("long"))
    a = None
    for _ in range(iters):
        a_raw = (
            nodes.join(
                e.join(h.selectExpr("node AS src", "r"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("r").cast("long").alias("_s")),
                "node",
                "left",
            )
            .select("node", F.coalesce("_s", F.lit(0).cast("long")).alias("r"))
        )
        a = _normalize(a_raw).localCheckpoint(eager=False)
        h_raw = (
            nodes.join(
                e.join(a.selectExpr("node AS dst", "r"), "dst")
                .groupBy(F.col("src").alias("node"))
                .agg(F.sum("r").cast("long").alias("_s")),
                "node",
                "left",
            )
            .select("node", F.coalesce("_s", F.lit(0).cast("long")).alias("r"))
        )
        h = _normalize(h_raw).localCheckpoint(eager=False)
    sc = float(HITS_SCALE)
    return (
        h.withColumnRenamed("r", "_h")
        .join(a.withColumnRenamed("r", "_a"), "node")
        .select(
            "node",
            (F.col("_h").cast("double") / F.lit(sc)).alias("hub"),
            (F.col("_a").cast("double") / F.lit(sc)).alias("authority"),
        )
    )


def hits_sql(edges_sql: str, iters: int = ITERS_DEFAULT) -> str:
    """DuckDB twin of :func:`hits`: iterations unrolled as chained CTEs,
    per-iteration totals as scalar subqueries over the raw CTE, the same
    BIGINT floor arithmetic. Every CTE is MATERIALIZED — each is
    referenced 3× (next stage + two scalar subqueries), and inlining
    would re-evaluate the chain exponentially (3^(2·iters)) — the same
    trap the Spark side avoids with localCheckpoint."""
    S = HITS_SCALE
    parts = [
        f"edges AS MATERIALIZED ( SELECT DISTINCT src, dst FROM ( {edges_sql} ) )",
        "nodes AS MATERIALIZED ( SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges) )",
        "nn AS MATERIALIZED ( SELECT count(*) AS n FROM nodes )",
        f"h0 AS MATERIALIZED ( SELECT node, {S} // (SELECT n FROM nn) AS r FROM nodes )",
    ]
    for i in range(iters):
        parts.append(
            f"a{i + 1}raw AS MATERIALIZED ( SELECT n.node, "
            f"CAST(coalesce(s.s, 0) AS BIGINT) AS r FROM nodes n LEFT JOIN "
            f"( SELECT e.dst AS node, CAST(sum(h.r) AS BIGINT) AS s "
            f"FROM edges e JOIN h{i} h ON e.src = h.node GROUP BY e.dst ) s "
            f"ON n.node = s.node )"
        )
        parts.append(
            f"a{i + 1} AS MATERIALIZED ( SELECT node, CASE WHEN "
            f"CAST((SELECT sum(r) FROM a{i + 1}raw) AS BIGINT) = 0 THEN 0 "
            f"ELSE (r * {S}) // CAST((SELECT sum(r) FROM a{i + 1}raw) AS BIGINT) "
            f"END AS r FROM a{i + 1}raw )"
        )
        parts.append(
            f"h{i + 1}raw AS MATERIALIZED ( SELECT n.node, "
            f"CAST(coalesce(s.s, 0) AS BIGINT) AS r FROM nodes n LEFT JOIN "
            f"( SELECT e.src AS node, CAST(sum(a.r) AS BIGINT) AS s "
            f"FROM edges e JOIN a{i + 1} a ON e.dst = a.node GROUP BY e.src ) s "
            f"ON n.node = s.node )"
        )
        parts.append(
            f"h{i + 1} AS MATERIALIZED ( SELECT node, CASE WHEN "
            f"CAST((SELECT sum(r) FROM h{i + 1}raw) AS BIGINT) = 0 THEN 0 "
            f"ELSE (r * {S}) // CAST((SELECT sum(r) FROM h{i + 1}raw) AS BIGINT) "
            f"END AS r FROM h{i + 1}raw )"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT h.node, CAST(h.r AS DOUBLE) / {float(S)!r} AS hub, "
        + f"CAST(a.r AS DOUBLE) / {float(S)!r} AS authority "
        + f"FROM h{iters} h JOIN a{iters} a ON h.node = a.node"
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
