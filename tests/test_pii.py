"""PII redaction: sentinel replacement, per-doc counts, redaction-order
pins, and DuckDB-twin parity (Java regex vs RE2 must agree on these
lookaround-free patterns)."""

import duckdb

from mycelium_spark.operators import pii


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in pii.pii_scrub(df).collect()}


def test_email_redacted_with_count(spark):
    r = _run(spark, [(1, "mail bob@example.com or alice.smith+x@mail-ex.co.uk now")])[1]
    assert r["redacted_text"] == "mail <EMAIL> or <EMAIL> now"
    assert r["n_emails"] == 2 and r["n_ips"] == 0 and r["n_phones"] == 0


def test_ipv4_redacted(spark):
    r = _run(spark, [(1, "server 10.0.255.7 and 192.168.1.254. done")])[1]
    assert r["redacted_text"] == "server <IP> and <IP>. done"
    assert r["n_ips"] == 2


def test_phone_redacted(spark):
    r = _run(spark, [(1, "call +1(555)123-4567 or 555-867-5309 now")])[1]
    assert r["redacted_text"] == "call <PHONE> or <PHONE> now"
    assert r["n_phones"] == 2


def test_email_domain_not_double_counted_as_ip(spark):
    # the email is consumed FIRST; its dotted domain never reaches the
    # IPv4 pass (order pin: email → ip → phone)
    r = _run(spark, [(1, "x user@10.0.0.1.example.com y")])[1]
    assert r["n_emails"] == 1 and r["n_ips"] == 0
    assert r["redacted_text"] == "x <EMAIL> y"


def test_clean_text_passes_through_byte_identical(spark):
    txt = "just ordinary words with no contact details at all"
    r = _run(spark, [(1, txt)])[1]
    assert r["redacted_text"] == txt
    assert r["n_emails"] == r["n_ips"] == r["n_phones"] == 0


def test_short_digit_runs_not_phone(spark):
    r = _run(spark, [(1, "year 2026 and id 12345 stay")])[1]
    assert r["n_phones"] == 0 and "2026" in r["redacted_text"]


def test_duckdb_twin_parity(spark):
    rows = [
        (0, "plain words only here"),
        (1, "mail bob@example.com or alice.smith+x@mail-ex.co.uk now"),
        (2, "server 10.0.255.7 and 192.168.1.254. done"),
        (3, "call +1(555)123-4567 or 555-867-5309 now"),
        (4, "mixed a@b.io then 8.8.8.8 then 555-867-5309"),
    ]
    got = sorted(
        tuple(r)
        for r in pii.pii_scrub(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    exp = sorted(tuple(r) for r in con.sql(pii.pii_scrub_sql("d")).fetchall())
    assert got == exp
