"""Archived-crawl ingestion e2e: a synthetic cc-index + WARC segment
pair ingested through plans/archive must yield text byte-identical to
the live fetch-join extraction of the same HTML (the input_hint
invariant across both ingest modes), honor the status/mime gate and
digest dedup, and drop corrupt members without failing."""

import gzip
import hashlib

from pyspark.sql import functions as F

from mycelium_spark.plans import archive
from mycelium_spark.sources import synth


def _http(body: bytes, status=200, ctype="text/html") -> bytes:
    return (
        b"HTTP/1.1 %d S\r\nContent-Type: %s\r\n\r\n" % (status, ctype.encode())
    ) + body


def _warc_rec(uri: str, payload: bytes) -> bytes:
    return (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: " + uri.encode()
        + b"\r\nWARC-Date: 2026-01-01T00:00:00Z\r\nContent-Type: application/http\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload + b"\r\n\r\n"
    )


def _build_archive(tmp_path, n=12):
    """n synth pages across 2 segment files + a CDXJ index; returns the
    expected url set. Page 5 is a 404, page 7 a PNG, page 9 a recrawl of
    page 1's content (same digest), page 11 a corrupt member."""
    segs = {0: b"", 1: b""}
    lines = []
    for i in range(n):
        url = synth.url_of(i)
        html = synth.page_html(1 if i == 9 else i, n)
        status, ctype = 200, "text/html"
        if i == 5:
            status = 404
        if i == 7:
            ctype = "image/png"
        digest = "sha1:" + hashlib.sha1(html).hexdigest()
        blob = gzip.compress(_warc_rec(url, _http(html, status, ctype)))
        if i == 11:
            blob = blob[: len(blob) // 2]  # corrupt member
        seg = i % 2
        off = len(segs[seg])
        segs[seg] += blob
        lines.append(
            f'key{i}) 2026010100000{i % 10} {{"url": "{url}", "mime": "{ctype}", '
            f'"status": "{status}", "digest": "{digest}", "length": "{len(blob)}", '
            f'"offset": "{off}", "filename": "seg{seg}.warc.gz"}}'
        )
    for s, data in segs.items():
        (tmp_path / f"seg{s}.warc.gz").write_bytes(data)
    (tmp_path / "idx.cdxj").write_text("\n".join(lines))


def test_archive_ingest_e2e(spark, tmp_path):
    _build_archive(tmp_path)
    out = archive.ingest_archive(
        spark, str(tmp_path / "idx.cdxj"), str(tmp_path)
    ).collect()
    got = {r["url"]: r for r in out}
    # 12 captures minus: 404 (5), png (7), digest-dup (9 dedups onto 1),
    # corrupt member (11) => 8 docs
    assert len(got) == 8
    assert synth.url_of(5) not in got and synth.url_of(7) not in got
    assert synth.url_of(11) not in got
    assert (synth.url_of(1) in got) != (synth.url_of(9) in got)  # one survivor
    assert all(r["http_status"] == 200 for r in got.values())

    # byte-identity vs the live extraction path on the same HTML
    from mycelium_spark.functions.udfs import EXTRACT_TYPE, extract_frame

    ids = [0, 1, 2, 3, 4, 6, 8, 10]
    live = spark.createDataFrame(
        [(synth.url_of(i), bytearray(synth.page_html(i, 12))) for i in ids],
        "url string, html binary",
    )
    ex = F.pandas_udf(extract_frame, EXTRACT_TYPE)
    live_text = {
        r["url"]: r["t"]
        for r in live.withColumn("e", ex("html", "url"))
        .select("url", F.col("e.text").alias("t"))
        .collect()
    }
    for i in ids:
        u = synth.url_of(i)
        if u in got:
            assert got[u]["text"] == live_text[u], u
    assert sum(len(r["links"]) for r in got.values()) > 0
