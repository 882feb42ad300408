"""UDF-layer tests: fast-path soundness (property-based) and batch kernels."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from mycelium_spark.functions.udfs import (
    _DOTSEG,
    _FAST_RE,
    extract_frame,
    headers_frame,
    normalize_url_series,
)
from mycelium_spark.functions.url import BadUrl, Url

_SEG_CHARS = "abcXYZ09!$&'()*+,.-:;=@_~"
_Q_CHARS = "abc09!$&'()*+,.-/:;=?@_~"


@st.composite
def fastpath_urls(draw):
    host = draw(st.from_regex(r"[a-z0-9]([a-z0-9.-]{0,10}[a-z0-9])?", fullmatch=True))
    port = draw(st.sampled_from(["", ":80", ":8080", ":1", ":9999"]))
    nseg = draw(st.integers(0, 4))
    segs = [
        "".join(draw(st.lists(st.sampled_from(_SEG_CHARS), min_size=1, max_size=8)))
        for _ in range(nseg)
    ]
    trailing = draw(st.booleans())
    path = "/" + "/".join(segs) + ("/" if trailing and segs else "")
    query = draw(st.sampled_from(["", "?", "?a=b", "?x/y?z:@"]))
    frag = draw(st.sampled_from(["", "#", "#f", "#a#b/c"]))
    return f"http://{host}{port}{path}{query}{frag}"


@settings(max_examples=300, deadline=None)
@given(fastpath_urls())
def test_fast_path_is_sound(url):
    """Any URL accepted by the fast-path regex must be normalize-invariant."""
    s = pd.Series([url])
    fast = s.str.fullmatch(_FAST_RE, na=False) & ~s.str.contains(_DOTSEG, regex=True, na=False)
    if not fast.iloc[0]:
        return  # not claimed by the fast path — nothing to prove
    u = Url(url)
    u.normalize()
    assert u.to_string() == url, f"fast path unsound for {url!r}"


def test_normalize_series_mixed():
    s = pd.Series(
        [
            "http://example.com/a/b",  # fast path
            "HTTP://EXAMPLE.com/a/../b",  # slow path
            "junk ://",
            None,
            "http://x.com/%7euser",
        ]
    )
    out = normalize_url_series(s)
    assert out.tolist() == [
        "http://example.com/a/b",
        "http://example.com/b",
        None,
        None,
        "http://x.com/~user",
    ]


def test_extract_frame_batch():
    htmls = pd.Series(
        [
            b"<html><head><title>Hi there</title></head><body>my body is great</body></html>",
            None,
            b'<body><a href="/x">L</a></body>',
        ]
    )
    urls = pd.Series(["http://example.com", "http://n.com", "http://b.com/a/"])
    df = extract_frame(htmls, urls)
    assert df["text"][0] == "\nHi there\nmy body is great"
    assert df["title"][0] == "Hi there"
    assert df["text"][1] is None
    assert df["links"][2] == [{"url": "http://b.com/x", "txt": "L"}]


def test_headers_frame_batch():
    df = headers_frame(pd.Series(["Content-Type: text/html; charset=utf-8\n", None, "X: y\n"]))
    assert df["content_type"][0] == "text/html"
    assert df["acceptable"][0] is True or df["acceptable"][0] == True  # noqa: E712
    assert df["content_type"][1] is None
    assert df["content_type"][2] == "UNSET"
