"""HTTP header parse tests — slashdot golden (Parse_http_headers_test.cc:12-34)
plus cases pinning the XHTML-fallthrough quirk (utils.cc:699)."""

from mycelium_spark.functions.headers import (
    CT_APPLICATION_PDF,
    CT_TEXT_HTML,
    CT_TEXT_PLAIN,
    CT_UNRECOGNIZED,
    CT_UNSET,
    CT_XHTML,
    acceptable,
    classify_content_type,
    parse_http_headers,
)

SLASHDOT = (
    "HTTP/1.1 200 OK\n"
    "Server: Apache/2.2.3 (CentOS)\n"
    "SLASH_LOG_DATA: shtml\n"
    "Cache-Control: no-cache\n"
    "Pragma: no-cache\n"
    "X-XRDS-Location: http://slashdot.org/slashdot.xrds\n"
    "Content-Type: text/html; charset=utf-8\n"
    "Content-Length: 98342\n"
    "Date: Sat, 07 Apr 2012 21:28:26 GMT\n"
    "X-Varnish: 33994908 33994320\n"
    "Age: 53\n"
    "Connection: keep-alive\n"
)


def test_slashdot_golden():
    ctype, charset, headermap = parse_http_headers(SLASHDOT)
    assert ctype == CT_TEXT_HTML
    assert charset == "utf-8"
    assert headermap["Server"] == " Apache/2.2.3 (CentOS)"
    assert headermap["Age"] == " 53"


def test_final_line_requires_newline():
    # tortoise/hare never processes an unterminated final line (utils.cc:683)
    ctype, charset, _ = parse_http_headers("Content-Type: text/html")
    assert ctype == CT_UNSET


def test_xhtml_fallthrough_quirk():
    # anything not html/plain that does NOT start with application/xhtml+xml
    # classifies as XHTML (utils.cc:699 is missing '!= npos')
    assert classify_content_type(" image/png") == CT_XHTML
    assert classify_content_type(" application/json") == CT_XHTML
    # a value that DOES start with it falls through to UNRECOGNIZED
    assert classify_content_type("application/xhtml+xml") == CT_UNRECOGNIZED
    # ...unless a later branch matches inside it
    assert classify_content_type("application/xhtml+xml application/pdf") == CT_APPLICATION_PDF
    assert classify_content_type("text/plain") == CT_TEXT_PLAIN


def test_acceptability_gate():
    assert acceptable(CT_TEXT_HTML)
    assert acceptable(CT_XHTML)
    assert not acceptable(CT_UNRECOGNIZED)
    assert not acceptable(CT_UNSET)


def test_charset_token_can_contain_spaces():
    ctype, charset, _ = parse_http_headers("Content-Type: text/html; charset=utf-8 extra\n")
    # token class excludes separators+CTLs but NOT space; charset is untrimmed
    assert charset == "utf-8 extra"
