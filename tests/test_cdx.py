"""CDXJ source + SURT canonicalization: adversarial key cases, line
framing (JSON block contains spaces), malformed-line survival, the
member-selection plan, and the distributed read path."""

import gzip

from pyspark.sql import functions as F

from mycelium_spark.sources import cdx

SURT_CASES = [
    # (url, expected urlkey)
    ("http://example.org/", "org,example)/"),
    ("https://EXAMPLE.ORG", "org,example)/"),
    ("http://www.example.org/a/B", "org,example)/a/b"),
    ("http://www2.example.org/x", "org,example)/x"),
    ("http://wwwx.example.org/x", "org,example,wwwx)/x"),  # only www\d* strips
    ("http://example.org:80/p", "org,example)/p"),
    ("https://example.org:443/p", "org,example)/p"),
    ("http://example.org:8080/p", "org,example:8080)/p"),
    ("http://a.b.example.org/", "org,example,b,a)/"),
    ("http://example.org/p?b=2&a=1", "org,example)/p?a=1&b=2"),
    ("http://example.org/p?b=2&&a=1&", "org,example)/p?a=1&b=2"),
    ("http://example.org/p?", "org,example)/p"),
    ("http://example.org/p#frag?x=1", "org,example)/p"),
    ("http://example.org?a=1", "org,example)/?a=1"),
    ("http://example.org/A/B/C.HTML", "org,example)/a/b/c.html"),
    # userinfo drops (published canonicalizer behavior)
    ("http://user:pw@example.org/p", "org,example)/p"),
    ("http://user@www.example.org:8080/p?b=2&a=1", "org,example:8080)/p?a=1&b=2"),
]


def test_surt_key_cases(spark):
    df = spark.createDataFrame([(u, e) for u, e in SURT_CASES], "url string, want string")
    rows = df.select("want", cdx.surt_key_expr(F.col("url")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["want"], (r["got"], r["want"])


def _line(urlkey, ts, url, status="200", mime="text/html", digest="sha1:AAA",
          length="1234", offset="56", filename="crawl/seg/f.warc.gz"):
    return (
        f'{urlkey} {ts} {{"url": "{url}", "mime": "{mime}", "status": "{status}", '
        f'"digest": "{digest}", "length": "{length}", "offset": "{offset}", '
        f'"filename": "{filename}"}}'
    )


def test_parse_cdxj_framing(spark):
    # JSON block contains spaces; the 3-limit split must keep it whole
    lines = spark.createDataFrame(
        [(_line("org,example)/", "20260101000000", "http://example.org/"),),
         ("org,bad)/ 20260101000000 not-json",),
         ("just-one-token",)],
        "value string",
    )
    out = {r["urlkey"]: r for r in cdx.parse_cdxj(lines).collect()}
    good = out["org,example)/"]
    assert good["url"] == "http://example.org/" and good["status"] == 200
    assert good["offset"] == 56 and good["length"] == 1234
    assert good["filename"] == "crawl/seg/f.warc.gz"
    # malformed lines survive as null-metadata rows, not exceptions
    assert out["org,bad)/"]["url"] is None
    assert out["just-one-token"]["url"] is None


def test_read_cdxj_gzip(spark, tmp_path):
    body = "\n".join(
        _line(f"org,h{i})/", "20260101000000", f"http://h{i}.org/") for i in range(5)
    )
    (tmp_path / "idx.cdxj.gz").write_bytes(gzip.compress(body.encode()))
    out = cdx.read_cdxj(spark, str(tmp_path / "idx.cdxj.gz")).collect()
    assert len(out) == 5 and {r["url"] for r in out} == {f"http://h{i}.org/" for i in range(5)}


def test_select_members_dedups_digest(spark):
    lines = spark.createDataFrame(
        [(_line("k1", "20260101000000", "http://a/", digest="sha1:X"),),
         (_line("k1", "20260201000000", "http://a/", digest="sha1:X"),),  # recrawl, same content
         (_line("k2", "20260101000000", "http://b/", digest="sha1:Y", status="404"),),
         (_line("k3", "20260101000000", "http://c/", digest="sha1:Z", mime="image/png"),)],
        "value string",
    )
    plan = cdx.select_members(cdx.parse_cdxj(lines)).collect()
    assert len(plan) == 1 and plan[0]["urlkey"] == "k1"


def test_surt_matches_url_kernel_normalization(spark):
    # keys must be stable across trivially-different spellings of one URL
    variants = ["http://WWW.Example.org/p?b=2&a=1",
                "https://example.org:443/p?a=1&b=2",
                "http://www3.example.org/p?a=1&&b=2"]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    keys = {r[0] for r in df.select(cdx.surt_key_expr(F.col("url"))).collect()}
    assert keys == {"org,example)/p?a=1&b=2"}
