"""Sequence packing: chunk coverage invariants, straddling-doc splits,
DuckDB-twin equivalence, and partitioning invariance."""

import duckdb

from mycelium_spark.operators import packing


def _docs(spark, rows, parts=None):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.repartition(parts) if parts else df


def _texts(n):
    # doc i has i+1 tokens
    return [(i, " ".join(f"w{j}" for j in range(i + 1))) for i in range(n)]


def test_matches_duckdb_twin(spark):
    rows = _texts(40)
    got = sorted(tuple(r) for r in packing.pack_sequences(_docs(spark, rows), 64).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    exp = sorted(tuple(r) for r in con.sql(packing.pack_sequences_sql(64, "d")).fetchall())
    assert got == exp
    assert len(got) > 40  # at least one doc straddles → more pieces than docs


def test_chunks_are_exactly_seq_len(spark):
    rows = _texts(40)
    total = sum(i + 1 for i in range(40))  # 820 tokens
    out = packing.pack_sequences(_docs(spark, rows), 64).collect()
    per_chunk = {}
    for r in out:
        per_chunk[r["chunk_id"]] = per_chunk.get(r["chunk_id"], 0) + r["piece_len"]
    n_chunks = max(per_chunk) + 1
    assert sorted(per_chunk) == list(range(n_chunks))  # no chunk gaps
    for cid, tok in per_chunk.items():
        if cid < n_chunks - 1:
            assert tok == 64  # every full chunk packs exactly seq_len
    assert per_chunk[n_chunks - 1] == total - 64 * (n_chunks - 1)  # tail remainder


def test_every_token_emitted_exactly_once(spark):
    rows = _texts(25)
    out = packing.pack_sequences(_docs(spark, rows), 16).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append((r["piece_start"], r["piece_len"]))
    assert set(per_doc) == set(range(25))
    for did, pieces in per_doc.items():
        pieces.sort()
        # pieces tile [0, n_tokens) contiguously with no overlap
        pos = 0
        for start, ln in pieces:
            assert start == pos and ln > 0
            pos += ln
        assert pos == did + 1  # doc i has i+1 tokens


def test_straddling_doc_splits_across_adjacent_chunks(spark):
    # 3 docs of 10 tokens each, seq_len 8: doc order is md5-keyed, but
    # whichever doc covers tokens [8,16) must split as 8/2 or sit inside
    rows = _texts(2) + [(2, " ".join("x" * 1 for _ in range(10)))]
    rows = [(0, " ".join(f"a{j}" for j in range(10))),
            (1, " ".join(f"b{j}" for j in range(10))),
            (2, " ".join(f"c{j}" for j in range(10)))]
    out = packing.pack_sequences(_docs(spark, rows), 8).collect()
    split_docs = {}
    for r in out:
        split_docs.setdefault(r["doc_id"], []).append(r)
    # 30 tokens / 8 → chunks 0..3; at least one doc spans two chunks
    multi = [d for d, rs in split_docs.items() if len(rs) > 1]
    assert multi
    for d in multi:
        rs = sorted(split_docs[d], key=lambda r: r["piece_start"])
        # adjacent chunk ids, contiguous pieces
        assert [r["chunk_id"] for r in rs] == list(
            range(rs[0]["chunk_id"], rs[0]["chunk_id"] + len(rs))
        )


def test_zero_token_docs_contribute_nothing(spark):
    rows = [(0, "a b c"), (1, ""), (2, " "), (3, "d e")]
    out = packing.pack_sequences(_docs(spark, rows), 4).collect()
    assert {r["doc_id"] for r in out} == {0, 3}
    assert sum(r["piece_len"] for r in out) == 5


def test_partitioning_invariance(spark):
    rows = _texts(40)
    a = sorted(tuple(r) for r in packing.pack_sequences(_docs(spark, rows), 64).collect())
    b = sorted(
        tuple(r) for r in packing.pack_sequences(_docs(spark, rows, parts=7), 64).collect()
    )
    assert a == b
