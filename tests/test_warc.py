"""WARC/WET source: framing parser unit tests (pure Python — adversarial
payloads, gzip members, truncation) plus the distributed read path."""

import gzip

from mycelium_spark.sources import warc


def _rec(uri, payload: bytes, wtype=b"response", extra=b""):
    return (
        b"WARC/1.0\r\nWARC-Type: " + wtype + b"\r\nWARC-Target-URI: " + uri
        + b"\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" + extra
        + b"Content-Type: text/plain\r\nContent-Length: "
        + str(len(payload)).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"
    )


def test_basic_records():
    data = _rec(b"http://a/", b"hello") + _rec(b"http://b/", b"world", wtype=b"conversion")
    out = warc.parse_warc_bytes(data, "f")
    assert [(r["target_uri"], r["warc_type"], r["payload"], r["rec_index"]) for r in out] == [
        ("http://a/", "response", b"hello", 0),
        ("http://b/", "conversion", b"world", 1),
    ]
    assert all(not r["truncated"] for r in out)


def test_payload_containing_warc_markers():
    # Content-Length framing must win over any content sniffing
    evil = b"\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nxyz"
    data = _rec(b"http://a/", evil) + _rec(b"http://b/", b"ok")
    out = warc.parse_warc_bytes(data)
    assert out[0]["payload"] == evil
    assert out[1]["payload"] == b"ok"
    assert len(out) == 2


def test_header_case_insensitive():
    data = _rec(b"http://a/", b"x").replace(b"Content-Length", b"CONTENT-length")
    out = warc.parse_warc_bytes(data)
    assert out[0]["content_length"] == 1 and out[0]["payload"] == b"x"


def test_truncated_tail_flagged_not_raised():
    full = _rec(b"http://a/", b"hello")
    cut = full + _rec(b"http://b/", b"0123456789")[:-8]  # payload cut short
    out = warc.parse_warc_bytes(cut)
    assert len(out) == 2
    assert not out[0]["truncated"] and out[1]["truncated"]
    # garbage after a good record: flagged on the last good one
    out2 = warc.parse_warc_bytes(full + b"not a warc header\r\n\r\n")
    assert len(out2) == 1 and out2[0]["truncated"]


def test_missing_content_length_stops_scan():
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"
    assert warc.parse_warc_bytes(bad) == []


def test_gzip_members_roundtrip():
    # Common Crawl layout: one gzip member per record
    members = b"".join(
        gzip.compress(_rec(f"http://h/{i}".encode(), b"p%d" % i)) for i in range(3)
    )
    out = warc.parse_warc_bytes(members)
    assert [r["payload"] for r in out] == [b"p0", b"p1", b"p2"]
    assert all(not r["truncated"] for r in out)


def test_utf8_content_length_is_bytes():
    payload = "héllo €".encode("utf-8")
    out = warc.parse_warc_bytes(_rec(b"http://u/", payload))
    assert out[0]["content_length"] == len(payload)
    assert out[0]["payload"].decode("utf-8") == "héllo €"


def test_distributed_read(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    for i in range(4):
        body = b"".join(_rec(f"http://f{i}/r{j}".encode(), b"x" * j) for j in range(5))
        (d / f"part{i}.warc").write_bytes(body if i % 2 else gzip.compress(body))
    out = warc.read_warc(spark, str(d) + "/*.warc").collect()
    assert len(out) == 20
    uris = {r["target_uri"] for r in out}
    assert "http://f3/r4" in uris and len(uris) == 20
    by_file = {}
    for r in out:
        by_file.setdefault(r["path"], []).append(r["rec_index"])
    assert all(sorted(v) == [0, 1, 2, 3, 4] for v in by_file.values())


def test_write_wet_roundtrip(spark, tmp_path):
    # the sink half: frame+write N files, read back byte-identical payloads
    docs = spark.createDataFrame(
        [(f"http://s/{i}", "text %d €\nline2" % i) for i in range(37)],
        "url string, text string",
    )
    out = str(tmp_path / "wet")
    manifest = warc.write_wet(docs, out, n_files=4)
    assert sum(m["n_records"] for m in manifest) == 37
    assert all(m["path"].endswith(".warc.gz") for m in manifest)
    back = warc.read_warc(spark, out + "/*.warc.gz").collect()
    assert len(back) == 37
    assert {r["target_uri"] for r in back} == {f"http://s/{i}" for i in range(37)}
    by_uri = {r["target_uri"]: r for r in back}
    for i in range(37):
        r = by_uri[f"http://s/{i}"]
        assert r["payload"].decode("utf-8") == "text %d €\nline2" % i
        assert r["warc_type"] == "conversion" and not r["truncated"]
        assert r["content_length"] == len(("text %d €\nline2" % i).encode())


def test_write_wet_uncompressed_and_deterministic(spark, tmp_path):
    docs = spark.createDataFrame(
        [(f"http://d/{i}", f"p{i}") for i in range(10)], "url string, text string"
    )
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    warc.write_wet(docs, a, n_files=3, compress=False)
    warc.write_wet(docs.repartition(7), b, n_files=3, compress=False)
    fa = sorted(p for p in __import__("os").listdir(a))
    fb = sorted(p for p in __import__("os").listdir(b))
    assert fa == fb
    for p in fa:  # same hash partitioning + within-file sort => byte-identical
        assert (tmp_path / "a" / p).read_bytes() == (tmp_path / "b" / p).read_bytes()


def _write_member_file(path, payloads, compress=True):
    """Write per-record gzip members; return [(offset, length)] coords."""
    coords = []
    with open(path, "wb") as fh:
        for i, p in enumerate(payloads):
            raw = _rec(f"http://m/{i}".encode(), p)
            blob = gzip.compress(raw) if compress else raw
            coords.append((fh.tell(), len(blob)))
            fh.write(blob)
    return coords


def test_fetch_members_ranged(spark, tmp_path):
    # two archives, fetch a strict subset of members by (offset, length)
    c0 = _write_member_file(tmp_path / "a0.warc.gz", [b"p0", b"p1", b"p2"])
    c1 = _write_member_file(tmp_path / "a1.warc.gz", [b"q0", b"q1"])
    plan = spark.createDataFrame(
        [("k0", "a0.warc.gz", *c0[0]), ("k2", "a0.warc.gz", *c0[2]),
         ("k1q", "a1.warc.gz", *c1[1])],
        "urlkey string, filename string, offset long, length long",
    )
    out = {r["urlkey"]: r for r in
           warc.fetch_members(plan, base_dir=str(tmp_path)).collect()}
    assert len(out) == 3
    assert bytes(out["k0"]["payload"]) == b"p0"
    assert bytes(out["k2"]["payload"]) == b"p2"
    assert bytes(out["k1q"]["payload"]) == b"q1"
    assert out["k2"]["target_uri"] == "http://m/2"
    assert not any(r["truncated"] for r in out.values())


def test_fetch_members_bad_range_and_missing_file(spark, tmp_path):
    c0 = _write_member_file(tmp_path / "a0.warc.gz", [b"p0"])
    plan = spark.createDataFrame(
        [("good", "a0.warc.gz", c0[0][0], c0[0][1]),
         # half the member: cuts into the deflate stream, not just the
         # 8-byte gzip trailer (trailer-only cuts still decode fully)
         ("short", "a0.warc.gz", c0[0][0], c0[0][1] // 2),
         ("gone", "nope.warc.gz", 0, 100)],
        "urlkey string, filename string, offset long, length long",
    )
    out = {r["urlkey"]: r for r in
           warc.fetch_members(plan, base_dir=str(tmp_path)).collect()}
    assert not out["good"]["truncated"]
    assert out["short"]["truncated"] and out["gone"]["truncated"]


def test_http_response_expr(spark):
    from pyspark.sql import functions as F

    body = "héllo € body\r\n\r\nwith a blank line".encode("utf-8")
    env = b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
    rows = spark.createDataFrame(
        [(env + body,), (b"no envelope at all",), (b"HTTP/1.0 301 Moved\r\nLocation: /x\r\n\r\n",)],
        "payload binary",
    ).select(warc.http_response_expr(F.col("payload")).alias("r")).collect()
    r0 = rows[0]["r"]
    assert r0["http_status"] == 200
    assert "Content-Type: text/html" in r0["http_headers"]
    assert bytes(r0["body"]) == body  # multibyte body sliced at the BYTE offset
    r1 = rows[1]["r"]
    assert r1["http_status"] is None and r1["http_headers"] is None
    assert bytes(r1["body"]) == b"no envelope at all"
    r2 = rows[2]["r"]
    assert r2["http_status"] == 301 and bytes(r2["body"]) == b""


def test_cdx_to_text_pipeline(spark, tmp_path):
    # the full archived-crawl read path: index -> plan -> ranged fetch ->
    # envelope split -> byte-identical body text
    from pyspark.sql import functions as F

    texts = {f"http://m/{i}": "doc %d body é%d" % (i, i) for i in range(6)}
    payloads = [
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + texts[f"http://m/{i}"].encode()
        for i in range(6)
    ]
    coords = _write_member_file(tmp_path / "seg.warc.gz", payloads)
    plan = spark.createDataFrame(
        [(f"k{i}", "seg.warc.gz", *coords[i]) for i in range(0, 6, 2)],
        "urlkey string, filename string, offset long, length long",
    )
    recs = warc.fetch_members(plan, base_dir=str(tmp_path))
    out = recs.select(
        "target_uri", warc.http_response_expr(F.col("payload")).alias("r")
    ).select("target_uri", F.col("r.http_status").alias("st"),
             F.col("r.body").cast("string").alias("text")).collect()
    assert len(out) == 3
    for r in out:
        assert r["st"] == 200 and r["text"] == texts[r["target_uri"]]


def test_fetch_members_rejects_colliding_plan_columns(spark, tmp_path):
    import pytest

    plan = spark.createDataFrame(
        [("x", "f.warc.gz", 0, 10)],
        "payload string, filename string, offset long, length long",
    )
    with pytest.raises(ValueError, match="collide"):
        warc.fetch_members(plan, base_dir=str(tmp_path))
