"""URL kernel parity tests.

Ports every case of the reference unit suite
(/root/reference/src/unit_tests/Url_test.cc:134-183) verbatim, plus
constructed cases for merge_ref (Url.cc:195-264), normalization quirks and
the escape tables.
"""

import pytest

from mycelium_spark import Url, UrlParseError, escape, normalize_url, unescape_all, unescape_safe
from mycelium_spark.functions.chartables import (
    URL_CHAR_PATH,
    URL_CHAR_QUERY,
    URL_CHAR_RESERVED,
    URL_CHAR_UNSAFE,
)

# (url, scheme, userinfo, host, port, path, query, fragment,
#  has_authority, has_query, has_fragment) — Url_test.cc:137-147
PARSE_CASES = [
    ("", "", "", "", "", "", "", "", False, False, False),
    ("mojito/para/todos", "", "", "", "", "mojito/para/todos", "", "", False, False, False),
    ("mojito?q=a+b+c&r=c#r", "", "", "", "", "mojito", "?q=a+b+c&r=c", "#r", False, True, True),
    ("culo?q=a&r=c#r", "", "", "", "", "culo", "?q=a&r=c", "#r", False, True, True),
    ("file:///", "file", "", "", "", "/", "", "", True, False, False),
    ("file:///a/b/c.html", "file", "", "", "", "/a/b/c.html", "", "", True, False, False),
    ("ftp://foo.com/bar/b.html?q=r#nn", "ftp", "", "foo.com", "", "/bar/b.html", "?q=r", "#nn", True, True, True),
    ("ftp://domo@foo.com:69/bar/b.html?q=r#nn", "ftp", "domo", "foo.com", "69", "/bar/b.html", "?q=r", "#nn", True, True, True),
    ("ftp://%32o@f%33oo.com:69/bar/b.html?q=r#nn", "ftp", "%32o", "f%33oo.com", "69", "/bar/b.html", "?q=r", "#nn", True, True, True),
    ("ftp://%32o@f%33oo.com:69/%2Fbar/b.html?q=r+b#nn", "ftp", "%32o", "f%33oo.com", "69", "/%2Fbar/b.html", "?q=r+b", "#nn", True, True, True),
    ("http://[fe80::202:3fff:feb7:e652]/rabo/mo?q=a#f", "http", "", "fe80::202:3fff:feb7:e652", "", "/rabo/mo", "?q=a", "#f", True, True, True),
]


@pytest.mark.parametrize("case", PARSE_CASES, ids=[c[0] or "<empty>" for c in PARSE_CASES])
def test_parsing(case):
    (url, scheme, userinfo, host, port, path, query, fragment,
     has_authority, has_query, has_fragment) = case
    u = Url(url)
    assert u.scheme() == scheme.encode()
    assert u.userinfo() == userinfo.encode()
    assert u.host() == host.encode()
    assert u.port() == port.encode()
    assert u.path() == path.encode()
    assert u.query() == query.encode()
    assert u.fragment() == fragment.encode()
    assert u.has_authority() == has_authority
    assert u.has_query() == has_query
    assert u.has_fragment() == has_fragment
    # reparse equality (Url_test.cc:81-85)
    assert u == Url(url)


# Url_test.cc:154-168
EQ_CASES = [
    ("", ""),
    ("/a/../b/", "/b/"),
    ("/%61/../%62/", "/b/"),
    ("/a/../b", "/b"),
    ("/a/../b", "/%62"),
    ("../b", "../b"),
    ("../b/", "../b/"),
    ("b/../c", "c"),
    ("b/a/i/../c", "b/a/c"),
    ("b/a/././../i/../c", "b/c"),
    (".", "."),
    ("http://domo.com/a/../b", "http://domo.com/b"),
    ("http://domo.com/a/../b/", "http://domo.com/b/"),
    ("http://note@domo.com/a/../b/", "http://note@domo.com/b/"),
]

# Url_test.cc:170-175
NOT_EQ_CASES = [
    ("", "?"),
    ("", "#"),
    ("http://host.com/#", "http://host.com/"),
    ("http://host.com/?", "http://host.com/"),
    ("http://note@domo.com/a/../b/", "http://note@domo.com/?q#f"),
    ("http://note@domo.com/", "http://note@domo.com/?#"),
]

# Url_test.cc:177-182
SIZE_CASES = [
    "http://host.com/#",
    "http://host.com/?",
    "http://host.com/path#crap",
    "http://host.com/omg?query",
    "http://note@domo.com/a/../b/",
    "http://note@domo.com/hello_cat",
]


@pytest.mark.parametrize("u1,u2", EQ_CASES)
def test_eq(u1, u2):
    assert Url(u1) == Url(u2)


@pytest.mark.parametrize("u1,u2", NOT_EQ_CASES)
def test_not_eq(u1, u2):
    assert Url(u1) != Url(u2)


@pytest.mark.parametrize("url", SIZE_CASES)
def test_size(url):
    assert Url(url).size() == len(url)


def test_parse_errors():
    # '//' with empty authority only for file: (Url.cc:79-88)
    with pytest.raises(UrlParseError):
        Url("http:///")
    Url("file:///")  # ok
    # invalid port
    with pytest.raises(UrlParseError):
        Url("http://host.com:99999/")
    with pytest.raises(UrlParseError):
        Url("http://host.com:0/")
    with pytest.raises(UrlParseError):
        Url("http://host.com:/")
    # authority starting with ':'
    with pytest.raises(UrlParseError):
        Url("http://:8080/")
    # invalid host chars
    with pytest.raises(UrlParseError):
        Url("http://ho st/")
    # unterminated IPv6 literal
    with pytest.raises(UrlParseError):
        Url("http://[fe80::1/")


def test_normalize_basics():
    assert normalize_url("HTTP://WWW.Example.COM/a/./b/../c") == "http://www.example.com/a/c"
    # unescape-safe + uppercase remaining escapes
    assert normalize_url("http://example.com/%7euser/%2fx%3f") == "http://example.com/~user/%2Fx%3F"
    # host lowering is ASCII-only
    assert normalize_url("http://ExAmPle.com/") == "http://example.com/"
    # query/fragment preserved with delimiters
    assert normalize_url("http://a.com/p?Q=%41#F%2f") == "http://a.com/p?Q=A#F%2F"


def test_normalize_trailing_dot_segments():
    # trailing '..' collapse sets the end slash (Path.cc:52-59)
    assert normalize_url("http://x.com/a/b/..") == "http://x.com/a/"
    assert normalize_url("http://x.com/a/.") == "http://x.com/a/"
    # '//' collapses at parse time (Path.cc:133-177)
    assert normalize_url("http://x.com//a//b") == "http://x.com/a/b"


def test_merge_ref_basic():
    base = Url("http://a.com/b/c/d;p?q")
    # RFC 3986 §5.4 style cases under reference semantics
    cases = [
        ("g", "http://a.com/b/c/g"),
        ("./g", "http://a.com/b/c/g"),
        ("g/", "http://a.com/b/c/g/"),
        ("/g", "http://a.com/g"),
        ("?y", "http://a.com/b/c/d;p?y"),
        ("g?y", "http://a.com/b/c/g?y"),
        ("#s", "http://a.com/b/c/d;p?q#s"),
        ("g#s", "http://a.com/b/c/g#s"),
        ("g?y#s", "http://a.com/b/c/g?y#s"),
        ("g.", "http://a.com/b/c/g."),
        (".g", "http://a.com/b/c/.g"),
        ("..", "http://a.com/b/"),
        ("../", "http://a.com/b/"),
        ("../g", "http://a.com/b/g"),
        ("../..", "http://a.com/"),
        ("../../g", "http://a.com/g"),
    ]
    for ref, expected in cases:
        b = base.copy()
        b.merge_ref(Url(ref))
        assert b.to_string() == expected, f"ref={ref}"


def test_merge_ref_authority():
    base = Url("http://a.com/b?q#f")
    b = base.copy()
    b.merge_ref(Url("//other.com/x"))
    # reference quirk: base query kept when ref has authority and no query
    # (Url.cc:221-228); fragment cleared (Url.cc:248-251)
    assert b.to_string() == "http://other.com/x?q"


def test_merge_ref_empty_path_query_only():
    base = Url("http://a.com/b/c?q#f")
    b = base.copy()
    b.merge_ref(Url("?newq"))
    assert b.to_string() == "http://a.com/b/c?newq"


def test_merge_ref_errors():
    with pytest.raises(Exception):
        Url("a/b").merge_ref(Url("http://x.com/"))
    with pytest.raises(Exception):
        Url("http://x.com/").merge_ref(Url("http://y.com/"))
    with pytest.raises(Exception):
        Url("a/b").merge_ref(Url("c/d"))


def test_escape_tables():
    # '%' followed by valid hex is preserved
    assert escape(b"a%41b", URL_CHAR_PATH | URL_CHAR_RESERVED | URL_CHAR_UNSAFE) == b"a%41b"
    # '%' not followed by hex gets escaped (it is in every class)
    assert escape(b"100%", URL_CHAR_UNSAFE) == b"100%25"
    # space escapes everywhere
    assert escape(b"a b", URL_CHAR_PATH) == b"a%20b"
    # '?' escapes in path but not in query
    assert escape(b"a?b", URL_CHAR_PATH) == b"a%3Fb"
    assert escape(b"a?b", URL_CHAR_QUERY) == b"a?b"
    # '#' escapes in query
    assert escape(b"a#b", URL_CHAR_QUERY) == b"a%23b"
    # non-ASCII bytes always escape
    assert escape("é", URL_CHAR_PATH) == b"%C3%A9"


def test_unescape_safe_keeps_reserved():
    # %2F is reserved ('/'), stays escaped; %61 ('a') unescapes
    assert unescape_safe(b"%2F%61") == b"%2Fa"
    # NUL is unsafe → never unescaped by unescape_safe
    assert unescape_safe(b"%00") == b"%00"
    # plain unescape decodes everything
    assert unescape_all(b"%2F%61%00") == b"/a\x00"


def test_normalize_fast_path_equivalence():
    """The no-'%' fast path in Url.normalize must match the full
    serialize-reparse path (normalize_escapes) exactly."""
    import random
    import string

    rng = random.Random(1234)
    chars = string.ascii_letters + string.digits + ":/?#@.~!$&'()*+,;=- []%7e"

    def slow_normalize(u):
        u.normalize_scheme()
        u.normalize_host()
        u.normalize_escapes()
        u._path.normalize()
        return u

    checked = 0
    for _ in range(20000):
        s = "".join(rng.choice(chars) for _ in range(rng.randint(0, 25)))
        try:
            fast = Url(s)
        except Exception:
            continue
        slow = fast.copy()
        try:
            slow_out = slow_normalize(slow).get()
            slow_err = None
        except Exception as e:
            slow_out, slow_err = None, type(e)
        try:
            fast_out = fast.normalize().get()
            fast_err = None
        except Exception as e:
            fast_out, fast_err = None, type(e)
        assert (slow_out, slow_err) == (fast_out, fast_err), s
        checked += 1
    assert checked > 5000


def test_normalized_url_is_join_key():
    variants = [
        "http://ExAmPle.com/a/../b",
        "http://example.com/b",
        "http://example.com/x/../b",
        "http://example.com/%62",
    ]
    assert len({normalize_url(v) for v in variants}) == 1
