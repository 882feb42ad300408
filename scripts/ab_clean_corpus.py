"""A/B: clean_corpus scan-sharing restructure (VERDICT r4 next #2).

Old shape: gopher_rules + repetition_filter each scan documents, join of
keeps, span removal over the re-scanned survivors.
New shape: quality.clean_gate — per-row rules in one projection, n-gram
stages off a localCheckpoint of the survivors.

Both variants EXCLUDE the (new) decontam gate so the comparison isolates
the restructure; the full new pipeline is also timed for the record.
Protocol: one session, alternating A/B/A/B/A/B at bench SF (the round-4
fusion lesson: never compare across sessions or SFs).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def steal_pct():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return vals, sum(vals)


def steal_delta(a, b):
    (va, ta), (vb, tb) = a, b
    dt = tb - ta
    return round(100.0 * (vb[7] - va[7]) / dt, 2) if dt else 0.0


def old_pipeline(spark, docs, F, quality, dedup):
    g = quality.gopher_rules(docs).filter("keep").select("doc_id")
    r = quality.repetition_filter(docs).filter("keep").select("doc_id")
    kept = docs.join(g, "doc_id").join(r, "doc_id")
    cleaned = dedup.remove_repeated_spans(kept, 5, 2)
    hashed = cleaned.select(
        "doc_id", F.md5(F.col("clean_text").cast("binary")).alias("clean_md5")
    )
    return hashed.groupBy("clean_md5").agg(F.min("doc_id").alias("doc_id"))


def new_pipeline(spark, docs, F, quality, dedup):
    base = quality.clean_gate(docs)
    cleaned = dedup.remove_repeated_spans(base, 5, 2)
    hashed = cleaned.select(
        "doc_id", F.md5(F.col("clean_text").cast("binary")).alias("clean_md5")
    )
    return hashed.groupBy("clean_md5").agg(F.min("doc_id").alias("doc_id"))


def full_new_pipeline(spark, docs, F, quality, dedup, decontam):
    base = quality.clean_gate(docs)
    dk = (
        decontam.decontaminate(base, docs.filter("doc_id % 17 = 0"), 13, 0.05)
        .filter("keep")
        .select("doc_id")
    )
    kept = base.join(dk, "doc_id")
    cleaned = dedup.remove_repeated_spans(kept, 5, 2)
    hashed = cleaned.select(
        "doc_id", F.md5(F.col("clean_text").cast("binary")).alias("clean_md5")
    )
    return hashed.groupBy("clean_md5").agg(F.min("doc_id").alias("doc_id"))


def main():
    from pyspark.sql import functions as F

    from bench import make_session
    from mycelium_spark.operators import decontam, dedup, quality

    spark = make_session(CPUS, "ab-clean-corpus")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    print(f"docs={n} sf_dir={SF_DIR} cores={CPUS}", flush=True)

    def run(fn, *extra):
        s0 = steal_pct()
        t0 = time.time()
        out = fn(spark, docs, F, quality, dedup, *extra)
        cnt = out.count()
        dt = time.time() - t0
        st = steal_delta(s0, steal_pct())
        return dt, cnt, st

    # warmup both shapes once
    run(old_pipeline)
    run(new_pipeline)

    results = {"old": [], "new": [], "full_new": []}
    for rep in range(3):
        for name, fn, extra in (
            ("old", old_pipeline, ()),
            ("new", new_pipeline, ()),
            ("full_new", full_new_pipeline, (decontam,)),
        ):
            dt, cnt, st = run(fn, *extra)
            results[name].append((dt, cnt, st))
            print(f"rep{rep} {name}: {dt:.2f}s rows={cnt} steal={st}%", flush=True)

    for name, rs in results.items():
        med = statistics.median(r[0] for r in rs)
        print(f"MEDIAN {name}: {med:.2f}s rows={rs[0][1]} "
              f"steals={[r[2] for r in rs]}", flush=True)
    counts = {name: rs[0][1] for name, rs in results.items()}
    assert counts["old"] == counts["new"], counts
    spark.stop()


if __name__ == "__main__":
    main()
