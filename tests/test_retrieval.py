"""BM25 retrieval: value parity against an independent pure-Python
reference, ranking invariants, and the Catalyst plan shape."""

import math

import pytest

from mycelium_spark.operators import retrieval


DOCS = [
    # doc 0: short, both query terms once → high score on q1
    (0, "hash join"),
    # doc 1: long, one term repeated — tf saturation should cap it
    (1, "hash hash hash hash filler filler filler filler filler filler"),
    # doc 2: neither term
    (2, "sort merge window"),
    # docs 3/4: identical content → identical scores, doc_id tie-break
    (3, "join table"),
    (4, "join table"),
]
QUERIES = [(1, "hash"), (1, "join")]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    """Independent reference: same formula, same rounding discipline."""
    toks = {d: [t for t in txt.split(" ") if t.isalnum()] for d, txt in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for v in toks.values():
        for t in set(v):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for qid, term in queries:
        for d, v in toks.items():
            tf = v.count(term)
            if not tf:
                continue
            idf = round(math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5)), 6)
            tfn = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            scores[(qid, d)] = scores.get((qid, d), 0.0) + round(idf * tfn, 6)
    return scores


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, term string")
    return {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in retrieval.bm25_topk(docs, qs, k=10).collect()
    }


def test_scores_match_python_reference(result):
    expect = _py_bm25(DOCS, QUERIES)
    assert set(result) == set(expect)
    for key, (_, score) in result.items():
        assert score == pytest.approx(expect[key], abs=2e-6), key


def test_identical_docs_tie_break_by_doc_id(result):
    r3, s3 = result[(1, 3)]
    r4, s4 = result[(1, 4)]
    assert s3 == s4
    assert r4 == r3 + 1


def test_tf_saturation_beats_repetition(result):
    # doc 0 matches both terms; doc 1 repeats one term in a long doc —
    # BM25's saturation + length normalization must rank doc 0 first
    assert result[(1, 0)][0] == 1
    assert result[(1, 0)][1] > result[(1, 1)][1]


def test_k_caps_results(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, term string")
    top1 = retrieval.bm25_topk(docs, qs, k=1).collect()
    assert len(top1) == 1 and top1[0]["doc_id"] == 0


def test_plan_broadcasts_queries_no_python(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, term string")
    plan = (
        retrieval.bm25_topk(docs, qs, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # query table broadcasts
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


# ---------------------------------------------------------------- phrase


def test_phrase_match_counts_and_overlaps(spark):
    docs = spark.createDataFrame(
        [
            (1, "a hash join b hash join"),   # two occurrences
            (2, "hash x join"),               # words present, not adjacent
            (3, "join hash"),                 # wrong order
            (4, "a a a"),                     # self-overlapping phrase case
            (5, "hash"),                      # shorter than the phrase
        ],
        "doc_id long, text string",
    )
    from mycelium_spark.operators.retrieval import phrase_match

    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_match(docs, "hash join").collect()}
    assert got == {1: 2}
    # the positional convention counts overlapping starts
    overlap = {r["doc_id"]: r["n_matches"]
               for r in phrase_match(docs, "a a").collect()}
    assert overlap[4] == 2


def test_phrase_match_plan_no_shuffle(spark):
    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    from mycelium_spark.operators.retrieval import phrase_match

    plan = (
        phrase_match(docs, "x y")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_phrase_snippets(spark):
    from mycelium_spark.operators.retrieval import phrase_snippets

    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 hash join w5 w6 w7 w8"),  # both sides clipped
            (2, "hash join tail"),                      # at the start
            (3, "lead hash join"),                      # at the end
            (4, "nothing to see"),                      # filtered out
            (5, "hash join mid hash join"),             # FIRST occurrence only
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["snippet"]
           for r in phrase_snippets(docs, "hash join", window=3).collect()}
    assert got == {
        1: "w2 w3 w4 hash join w5 w6 w7",
        2: "hash join tail",
        3: "lead hash join",
        5: "hash join mid hash join",
    }


def test_bm25_prebuilt_index_matches_adhoc_and_stays_bounded(spark):
    """The build-once index (round-5 verdict wrong #2) must (a) score
    identically to the ad-hoc path and (b) leave no pinned CacheManager
    relations behind: the ad-hoc path holds none at all, and the built
    index releases its one relation on unpersist()."""
    from mycelium_spark.operators.retrieval import bm25_build, bm25_topk

    docs = spark.createDataFrame(
        [(i, f"spark fast w{i % 7} join window sort " * (1 + i % 3))
         for i in range(40)],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(1, "spark"), (1, "join"), (2, "sort")], "query_id long, term string"
    )
    cm = spark._jsparkSession.sharedState().cacheManager()
    cm.clearCache()
    adhoc = sorted(map(tuple, bm25_topk(docs, queries, k=5).collect()))
    adhoc2 = sorted(map(tuple, bm25_topk(docs, queries, k=5).collect()))
    assert adhoc == adhoc2
    assert cm.isEmpty(), "ad-hoc bm25 calls must not accumulate cached relations"
    idx = bm25_build(docs)
    via_index = sorted(
        map(tuple, bm25_topk(docs, queries, k=5, index=idx).collect())
    )
    assert via_index == adhoc
    assert not cm.isEmpty()  # exactly the index's term table is cached
    idx.unpersist()
    assert cm.isEmpty(), "unpersist() must release the index relation"
