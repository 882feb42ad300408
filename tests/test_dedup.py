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
