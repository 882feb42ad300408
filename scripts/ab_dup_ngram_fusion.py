"""A/B retest (VERDICT r4 next #4): per-n dup-n-gram loop vs the fused
single-explode variant, at a LARGER scale than the round-4 test.

Round-4 history: the fused variant (commit a6bddbb) looked 2.3x faster at
sf0.01 but was ~2x SLOWER at sf0.1 (reverted, 1cc7f6e) — job overhead
amortized away and the wider window sort + pivot dominated. The judge
asked whether the tradeoff inverts again at >=5x docs where shuffle mass
dominates. This script times ONLY the dup-{5..10}-gram half (the part
that differs) over sf0.1 documents replicated R times with distinct
doc_ids (per-doc keyed aggs are indifferent to cross-doc duplication),
alternating variants in one session.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("SPARK_GRAFT_DUP_REPLICAS", "5"))
_DUP_NS = (5, 6, 7, 8, 9, 10)


def steal_sample():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v, sum(v)


def steal_delta(a, b):
    dt = b[1] - a[1]
    return round(100.0 * (b[0][7] - a[0][7]) / dt, 2) if dt else 0.0


def per_n_loop(docs, F, Window, toks, text_col, id_col):
    """Current production shape: one explode + window + join per n."""
    tok_lens = docs.select(
        F.col(id_col), F.posexplode(F.expr(toks)).alias("_p", "_t")
    ).select(id_col, "_p", F.length("_t").alias("_len"))
    out = docs.select(id_col)
    for n in _DUP_NS:
        ng_arr = (
            f"CASE WHEN size({toks}) >= {n} THEN "
            f"transform(sequence(1, size({toks}) - {n} + 1), "
            f"i -> concat_ws(' ', slice({toks}, i, {n}))) ELSE array() END"
        )
        pos_ng = docs.select(
            F.col(id_col), F.length(text_col).alias("_tot"),
            F.posexplode(F.expr(ng_arr)).alias("_pos", "g"),
        )
        w = Window.partitionBy(id_col, "g")
        hits = (
            pos_ng.withColumn("_c", F.count(F.lit(1)).over(w))
            .filter(F.col("_c") > 1).select(id_col, "_tot", "_pos")
        )
        cov_pos = hits.select(
            id_col, "_tot",
            F.explode(F.sequence(F.col("_pos"), F.col("_pos") + (n - 1))).alias("_p"),
        ).dropDuplicates([id_col, "_p"])
        cov = (
            cov_pos.join(tok_lens, [id_col, "_p"])
            .groupBy(id_col, "_tot").agg(F.sum("_len").alias("_cov"))
            .select(id_col, F.round(F.col("_cov") / F.col("_tot"), 6).alias(f"dup{n}"))
        )
        out = out.join(cov, id_col, "left")
    return out


def fused(docs, F, Window, toks, text_col, id_col):
    """Round-4 fused shape (commit a6bddbb): one explode of (n, pos, gram)
    tuples, one window over (doc, n, gram), one union, one pivot."""
    tok_lens = docs.select(
        F.col(id_col), F.posexplode(F.expr(toks)).alias("_p", "_t")
    ).select(id_col, "_p", F.length("_t").alias("_len"))
    ns_arr = "array(" + ", ".join(str(n) for n in _DUP_NS) + ")"
    fused_e = (
        f"flatten(transform({ns_arr}, n -> "
        f"CASE WHEN size({toks}) >= n THEN "
        f"transform(sequence(1, size({toks}) - n + 1), "
        f"i -> named_struct('n', n, 'pos', i - 1, "
        f"'g', concat_ws(' ', slice({toks}, i, n)))) ELSE array() END))"
    )
    pos_ng = docs.select(
        F.col(id_col), F.length(text_col).alias("_tot"),
        F.explode(F.expr(fused_e)).alias("_e"),
    ).select(id_col, "_tot", "_e.n", "_e.pos", "_e.g")
    w = Window.partitionBy(id_col, "n", "g")
    hits = (
        pos_ng.withColumn("_c", F.count(F.lit(1)).over(w))
        .filter(F.col("_c") > 1).select(id_col, "_tot", "n", "pos")
    )
    cov_pos = hits.select(
        id_col, "_tot", "n",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)).alias("_p"),
    ).dropDuplicates([id_col, "n", "_p"])
    covs = (
        cov_pos.join(tok_lens, [id_col, "_p"])
        .groupBy(id_col, "_tot").pivot("n", list(_DUP_NS)).sum("_len")
    )
    sel = [F.col(id_col)] + [
        F.round(F.col(str(n)) / F.col("_tot"), 6).alias(f"dup{n}") for n in _DUP_NS
    ]
    return docs.select(id_col).join(covs.select(*sel), id_col, "left")


def main():
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from bench import make_session

    spark = make_session(CPUS, "ab-dup-ngram-fusion")
    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    base_n = raw.count()
    reps = [raw.selectExpr(f"doc_id + {i * 10_000_000} AS doc_id", "text")
            for i in range(REPLICAS)]
    docs = reps[0]
    for r in reps[1:]:
        docs = docs.unionByName(r)
    docs = docs.localCheckpoint(eager=True)  # isolate input cost from the A/B
    n = docs.count()
    print(f"docs={n} ({REPLICAS}x{base_n}) sf_dir={SF_DIR} cores={CPUS}", flush=True)

    toks = "filter(split(text, ' '), t -> t != '')"

    def run(fn):
        s0 = steal_sample()
        t0 = time.time()
        cnt = fn(docs, F, Window, toks, "text", "doc_id").count()
        dt = time.time() - t0
        return dt, cnt, steal_delta(s0, steal_sample())

    run(per_n_loop)  # warmup
    run(fused)
    res = {"per_n_loop": [], "fused": []}
    for rep in range(3):
        for name, fn in (("per_n_loop", per_n_loop), ("fused", fused)):
            dt, cnt, st = run(fn)
            res[name].append((dt, cnt, st))
            print(f"rep{rep} {name}: {dt:.2f}s rows={cnt} steal={st}%", flush=True)
    for name, rs in res.items():
        print(f"MEDIAN {name}: {statistics.median(r[0] for r in rs):.2f}s "
              f"steals={[r[2] for r in rs]}", flush=True)
    assert res["per_n_loop"][0][1] == res["fused"][0][1]
    spark.stop()


if __name__ == "__main__":
    main()
