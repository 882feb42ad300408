"""Dedup operators vs their DuckDB oracle SQL on the sf0.001 testdata.

This mirrors what the driver's correctness gate does: run the Spark
DataFrame recipe and the oracle SQL side-by-side and compare result sets.
"""

import duckdb
import pytest

from mycelium_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def assert_same(spark_df, duck_rel, sort_cols):
    a = sorted(tuple(r) for r in spark_df.select(*sort_cols).collect())
    b = sorted(tuple(r) for r in duck_rel.fetchall())
    assert a == b, f"spark={len(a)} duck={len(b)} first_diff={next(((x, y) for x, y in zip(a, b) if x != y), None)}"


def test_exact_dedup(docs, con):
    assert_same(
        dedup.exact_dedup(docs),
        con.sql(dedup.exact_dedup_sql()),
        ["doc_id", "n_dupes"],
    )


def test_minhash_signatures_match_oracle(docs, con, spark):
    sigs = dedup.minhash_signatures(docs, num_perm=4, k=3)
    perms = dedup._perm_constants(4)
    sig_sql = ", ".join(
        f"min((h * {a} + {b}) % {dedup.MOD}) AS sig{i}" for i, (a, b) in enumerate(perms)
    )
    sh = dedup.shingles_sql("string_split(text, ' ')", 3)
    q = f"""
    WITH sh AS (SELECT doc_id, unnest({sh}) AS s FROM documents),
    hashed AS (SELECT doc_id, {dedup._hash28_sql('s')} AS h FROM sh)
    SELECT doc_id, {sig_sql} FROM hashed GROUP BY doc_id
    """
    assert_same(sigs, con.sql(q), ["doc_id", "sig0", "sig1", "sig2", "sig3"])


def test_minhash_dedup_pairs(docs, con):
    assert_same(
        dedup.minhash_dedup_pairs(docs, num_perm=8, bands=4, k=3, threshold=0.3),
        con.sql(dedup.minhash_dedup_sql(num_perm=8, bands=4, k=3, threshold=0.3)),
        ["id_a", "id_b", "jaccard"],
    )


def test_simhash_pairs(docs, con):
    assert_same(
        dedup.simhash_pairs(docs, max_hamming=6),
        con.sql(dedup.simhash_sql(max_hamming=6)),
        ["id_a", "id_b", "hamming"],
    )


def test_ngram_jaccard_pairs(docs, con):
    assert_same(
        dedup.ngram_jaccard_pairs(docs, k=5, threshold=0.4),
        con.sql(dedup.ngram_jaccard_sql(k=5, threshold=0.4)),
        ["id_a", "id_b", "jaccard"],
    )


def test_embedding_neardup(emb, con):
    assert_same(
        dedup.embedding_neardup_pairs(emb, threshold=0.8),
        con.sql(dedup.embedding_neardup_sql(threshold=0.8)),
        ["id_a", "id_b", "cosine"],
    )


def test_ngram_jaccard_df_pruned_matches_oracle(docs, con):
    assert_same(
        dedup.ngram_jaccard_pairs(docs, k=5, threshold=0.4, max_df=20),
        con.sql(dedup.ngram_jaccard_sql(k=5, threshold=0.4, max_df=20)),
        ["id_a", "id_b", "jaccard"],
    )


def test_ngram_df_pruning_bounds_stopword_buckets(spark):
    """Stopword-heavy corpus: every doc shares the same boilerplate shingle;
    unpruned blocking goes quadratic (n*(n-1)/2 candidates), df-pruning
    keeps only the genuinely-similar pairs and the candidate count stays
    bounded by the rare-shingle buckets."""
    from pyspark.sql import functions as F

    n = 120
    boiler = "terms of service apply to all"
    rows = []
    for i in range(n):
        uniq = f"u{i}a u{i}b u{i}c u{i}d u{i}e"
        rows.append((i, f"{boiler} {uniq}"))
    # one true near-dup pair sharing rare shingles
    rows.append((n, f"{boiler} u7a u7b u7c u7d u7e extra"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def count_candidates(max_df):
        ss = df.select(
            "doc_id",
            F.expr(
                "array_distinct(" + dedup.shingles_expr("split(text, ' ')", 3) + ")"
            ).alias("ss"),
        )
        melted = ss.select("doc_id", F.explode("ss").alias("sh"))
        if max_df is not None:
            hot = (
                melted.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") > max_df).select("sh")
            )
            melted = melted.join(F.broadcast(hot), "sh", "left_anti")
        return (
            melted.alias("x").join(melted.alias("y"), "sh")
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select("x.doc_id", "y.doc_id").distinct().count()
        )

    unpruned = count_candidates(None)
    pruned = count_candidates(10)
    assert unpruned >= n * (n - 1) // 2  # quadratic blow-up without pruning
    assert pruned < 50  # bounded: only rare-shingle co-occurrences survive
    # the true near-dup pair is still found after pruning
    found = dedup.ngram_jaccard_pairs(df, k=3, threshold=0.4, max_df=10).collect()
    assert any(r["id_a"] == 7 and r["id_b"] == n for r in found)


def test_repeated_spans_oracle(docs, con):
    assert_same(
        dedup.repeated_spans(docs, k=5, min_df=2),
        con.sql(dedup.repeated_spans_sql(k=5, min_df=2)),
        ["doc_id", "span_start", "span_end", "n_shingles"],
    )


def test_repeated_spans_known_corpus(spark):
    """Boilerplate shared by two docs is found as ONE maximal merged span
    with exact token offsets; unique text yields no spans."""
    boiler = "all rights reserved contact us at example dot com"  # 9 tokens
    rows = [
        (0, f"alpha beta gamma {boiler} delta"),
        (1, f"{boiler} epsilon zeta"),
        (2, "entirely unique text with no repeats whatsoever here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_shingles"])
        for r in dedup.repeated_spans(df, k=4, min_df=2).collect()
    }
    # doc 0: boilerplate starts at token 3, 9 tokens -> span [3, 12), 6 shingles
    assert spans[0] == (3, 12, 6)
    # doc 1: starts at 0 -> [0, 9)
    assert spans[1] == (0, 9, 6)
    assert 2 not in spans


def test_span_removal_oracle(docs, con):
    assert_same(
        dedup.remove_repeated_spans(docs, k=5, min_df=2),
        con.sql(dedup.remove_repeated_spans_sql(k=5, min_df=2)),
        ["doc_id", "clean_text"],
    )


def test_span_removal_known_corpus(spark):
    """Splice semantics: covered tokens go, kept text is byte-stable."""
    boiler = "all rights reserved contact us at example dot com"  # 9 tokens
    rows = [
        (0, f"alpha beta gamma {boiler} delta"),
        (1, f"{boiler} epsilon zeta"),
        (2, "entirely unique text with no repeats whatsoever here"),
        (3, boiler),  # fully covered → ''
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["clean_text"]
        for r in dedup.remove_repeated_spans(df, k=4, min_df=2).collect()
    }
    assert got[0] == "alpha beta gamma delta"
    assert got[1] == "epsilon zeta"
    assert got[2] == rows[2][1]  # untouched doc is byte-identical
    assert got[3] == ""
