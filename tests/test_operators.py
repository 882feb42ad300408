"""Similarity / quality / index / multimodal operators vs DuckDB oracles
and shape checks, on sf0.001 testdata."""

import duckdb
import pytest

from mycelium_spark.functions import text as T
from mycelium_spark.operators import index, multimodal, quality, similarity

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
    assert len(a) == len(b), f"row counts differ: spark={len(a)} duck={len(b)}"
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    assert not diffs, f"{len(diffs)} diffs, first: {diffs[0]}"


# ---- similarity ----
def test_cosine_topk(emb, con):
    q = similarity.deterministic_query(64)
    assert_same(
        similarity.cosine_topk(emb, q, k=15),
        con.sql(similarity.cosine_topk_sql(q, k=15)),
        ["vec_id", "cosine"],
    )


def test_ann_topk(emb, con):
    q = similarity.deterministic_query(64)
    assert_same(
        similarity.ann_topk(emb, q, k=10, n_planes=4, multiprobe=1),
        con.sql(similarity.ann_topk_sql(q, k=10, n_planes=4, multiprobe=1)),
        ["vec_id", "cosine"],
    )


def test_ann_prunes_and_overlaps(emb):
    q = similarity.deterministic_query(64)
    exact = {r.vec_id for r in similarity.cosine_topk(emb, q, k=10).collect()}
    planes = similarity.hyperplanes(4, 64)
    from pyspark.sql import functions as F

    probed = emb.filter(
        F.expr(similarity.bucket_expr("embedding", planes)).isin(
            *[similarity.query_bucket(q, planes)]
        )
    ).count()
    # the bucket filter actually prunes (≈1/16 of the table for 4 planes)
    assert 0 < probed < emb.count() / 4
    # on uniform-random embeddings (near-orthogonal to any query) recall is
    # chance-level by construction; assert overlap exists with multiprobe
    approx = {
        r.vec_id
        for r in similarity.ann_topk(emb, q, k=10, n_planes=4, multiprobe=1).collect()
    }
    assert len(exact & approx) >= 1


# ---- quality / text analysis ----
def test_lang_id(docs, con):
    assert_same(quality.lang_id(docs), con.sql(quality.lang_id_sql()), ["doc_id", "lang_pred"])


def test_lang_id_python_twin_agrees(docs):
    rows = docs.limit(50).collect()
    spark_pred = {
        r.doc_id: p.lang_pred
        for r, p in zip(rows, [])
    }  # placeholder to keep flake quiet
    got = {r.doc_id: T.lang_id(r.text) for r in rows}
    from_spark = {
        r.doc_id: r.lang_pred
        for r in quality.lang_id(docs.limit(50)).collect()
    }
    assert got == from_spark


def test_quality_features(docs, con):
    assert_same(
        quality.quality_features(docs),
        con.sql(quality.quality_features_sql()),
        ["doc_id", "n_chars", "n_tokens", "alpha_ratio", "punct_ratio", "stopword_ratio", "mean_token_len"],
    )


def test_token_counts(docs, con):
    assert_same(
        quality.token_counts(docs), con.sql(quality.token_counts_sql()), ["doc_id", "ws_tokens", "bpe_tokens"]
    )


def test_fingerprints(docs, con):
    assert_same(
        quality.fingerprints(docs), con.sql(quality.fingerprints_sql()), ["doc_id", "fingerprint"]
    )
    # python twin agrees on a sample
    sample = docs.limit(5).collect()
    fps = {r.doc_id: T.fingerprint(r.text) for r in sample}
    got = {
        r.doc_id: r.fingerprint
        for r in quality.fingerprints(docs.limit(5)).collect()
    }
    assert fps == got


# ---- inverted index ----
def test_postings_stats(docs, con):
    assert_same(
        index.postings_stats(docs),
        con.sql(index.postings_stats_sql()),
        ["term", "df", "total_tf", "first_doc", "max_tf"],
    )


def test_postings_sorted(docs):
    p = index.postings(docs).filter("df >= 3").limit(5).collect()
    assert p
    for row in p:
        ids = [x.doc_id for x in row.postings]
        assert ids == sorted(ids)
        assert row.df == len(ids)


def test_tf_idf(docs, con):
    assert_same(
        index.tf_idf(docs), con.sql(index.tf_idf_sql()), ["doc_id", "term", "tf", "idf", "tf_idf"]
    )


# ---- multimodal ----
def test_extract_features_shapes(spark):
    blobs = multimodal.synth_blob_table(spark, 30)
    feats = multimodal.extract_features(blobs, dim=16).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.features) == 16
        assert all(-1.0 <= x <= 1.0 for x in r.features)
    # determinism
    feats2 = multimodal.extract_features(multimodal.synth_blob_table(spark, 30), dim=16).collect()
    assert sorted(r.features for r in feats) == sorted(r.features for r in feats2)


def test_frame_sample(spark):
    blobs = multimodal.synth_blob_table(spark, 9).filter("kind = 'video'")
    frames = multimodal.frame_sample(blobs, n_frames=4).collect()
    n_blobs = blobs.count()
    assert len(frames) == 4 * n_blobs
    idx = {(r.blob_id, r.frame_idx) for r in frames}
    assert len(idx) == len(frames)


def test_real_decode_raises(spark):
    blobs = multimodal.synth_blob_table(spark, 3)
    import pytest as _pytest

    with _pytest.raises(Exception):
        multimodal.extract_features(blobs, decode="real").collect()
    with _pytest.raises(NotImplementedError):
        multimodal.resize_stub(blobs, 32, 32)
