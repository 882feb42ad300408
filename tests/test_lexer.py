"""HTML lexer parity tests.

Golden from /root/reference/doc/sphinx/source/html_lexer.rst:10-31 plus
constructed fixtures pinning each sub-operator of SURVEY.md §2.3 (H1-H7),
including the reference's quirks.
"""

from mycelium_spark.functions.lexer import html_lex
from mycelium_spark.functions.entities import replace_all_entities


def test_rst_golden():
    """doc/sphinx/source/html_lexer.rst:14-31."""
    r = html_lex(
        "<html><head><title>Hi there</title></head><body>my body is great</body></html>",
        "http://example.com",
    )
    assert r.text == b"\nHi there\nmy body is great"
    assert r.analysis.title == b"Hi there"


def test_word_break_dedup():
    # consecutive break tags emit a single '\n' (HTML_lexer.cc:255-264)
    r = html_lex("<body>a<div><p><br>b</p></div>c</body>", "http://x.com/")
    assert r.text == b"\na\nb\nc"


def test_span_is_not_a_break():
    r = html_lex("<body>a<span>b</span>c</body>", "http://x.com/")
    assert r.text == b"\nabc"


def test_script_and_style_suppressed():
    r = html_lex("<body>a<script>var x = '<p>hi</p>';</script><p>b</p></body>", "http://x.com/")
    # script content dropped; the <p> START token joins the pending END-script
    # batch and is dropped too (only the batch front dispatches), so no break
    # before 'b'; the closing </p> emits one
    assert r.text == b"\nab\n"
    r2 = html_lex("<body>a<style>p {color: red}</style><p>b</p></body>", "http://x.com/")
    assert r2.text == b"\na\nb\n"


def test_data_after_script_close_is_dropped():
    # quirk: </script> queues END without process(); the following DATA joins
    # that batch and only the front token dispatches (html.ll:156-179,
    # HTML_lexer.cc:744-764)
    r = html_lex("<body>a<script>x</script>LOST<p>kept</p></body>", "http://x.com/")
    assert r.text == b"\na\nkept\n"


def test_script_prefix_tag_quirk():
    # strncasecmp(yytext, "script", yyleng): any prefix of "script" enters
    # script mode — '<s>' swallows until </script> (html.ll:240)
    r = html_lex("<body>a<s>gone</script>b<p>c</p></body>", "http://x.com/")
    assert r.text == b"\na\nc\n"  # 'gone' swallowed; 'b' dropped with END batch


def test_comments_dropped():
    r = html_lex("<body>a<!-- no <p> break -->b</body>", "http://x.com/")
    assert r.text == b"\nab"


def test_entities():
    r = html_lex("<body>a&amp;b &lt;x&gt; &#65;&#x42; &copy;</body>", "http://x.com/")
    assert r.text == "\na&b <x> AB ©".encode("utf-8")


def test_unknown_entity_deleted():
    # unknown named entities are deleted (Entity_handler.cc:287-294)
    r = html_lex("<body>a&bogus;b</body>", "http://x.com/")
    assert r.text == b"\nab"


def test_entity_case_sensitivity():
    # table is case-sensitive with six uppercase aliases
    assert replace_all_entities(b"&AMP;") == b"&"
    assert replace_all_entities(b"&Amp;") == b""
    assert replace_all_entities(b"&COPY;&copy;") == "©©".encode()


def test_entity_cascade():
    # sequential passes: dec output completes a hex pattern
    assert replace_all_entities(b"&#38;#x41;") == b"A"


def test_numeric_entity_out_of_range():
    assert replace_all_entities(b"a&#1114112;b") == b"ab"  # > U+10FFFF
    assert replace_all_entities(b"a&#55296;b") == b"ab"  # surrogate


def test_links_absolute_and_relative():
    html = (
        '<body><a href="http://other.com/x">X</a>'
        '<a href="../up/y.html">Y</a>'
        '<a href="/abs">Z</a></body>'
    )
    r = html_lex(html, "http://example.com/a/b/c.html")
    assert r.links == [
        (b"http://other.com/x", b"X"),
        (b"http://example.com/a/up/y.html", b"Y"),
        (b"http://example.com/abs", b"Z"),
    ]


def test_link_text_accumulates_with_word_breaks():
    r = html_lex('<body><a href="http://o.com/">one<br>two</a></body>', "http://x.com/")
    assert r.links == [(b"http://o.com/", b"one two")]
    assert r.text == b"\nonetwo"  # br inside link appends ' ' to anchor only


def test_nofollow_drops_link():
    html = '<body><a href="http://o.com/a" rel="nofollow">A</a><a href="http://o.com/b">B</a></body>'
    r = html_lex(html, "http://x.com/")
    # quirk: the nofollow path of op_a_c doesn't clear curlink, so the dropped
    # link's anchor text leaks into the next one (HTML_lexer.cc:551-557)
    assert r.links == [(b"http://o.com/b", b"AB")]


def test_unquoted_href_name_token_yields_no_link():
    # quirk: 'href=foo' is an NMTOKEN, not LITERAL → op_a ignores it
    # (html.ll:318-321 wins the tie over the unquoted-literal rule)
    r = html_lex("<body><a href=foo>A</a></body>", "http://x.com/")
    assert r.links == []
    # but an unquoted value with '/' is a LITERAL → link
    r2 = html_lex("<body><a href=http://o.com/p>A</a></body>", "http://x.com/")
    assert r2.links == [(b"http://o.com/p", b"A")]


def test_hreflang_prefix_quirk():
    # attr match is by prefix: hreflang counts as href (HTML_lexer.cc:520)
    r = html_lex('<body><a hreflang="http://o.com/l">A</a></body>', "http://x.com/")
    assert r.links == [(b"http://o.com/l", b"A")]


def test_frame_and_iframe_links():
    html = '<body><frame src="http://f.com/1"></frame><iframe src="/two"></iframe></body>'
    r = html_lex(html, "http://x.com/")
    # op_frame calls word_break while INLINK → a single ' ' as anchor text
    # (HTML_lexer.cc:590, 309-317)
    assert (b"http://f.com/1", b" ") in r.links
    assert (b"http://x.com/two", b" ") in r.links


def test_meta_refresh_link():
    html = '<head><meta http-equiv="refresh" content="0; url=http://next.com/p"></head>'
    r = html_lex(html, "http://x.com/")
    assert r.links == [(b"http://next.com/p", b"")]


def test_meta_robots():
    r = html_lex('<head><meta name="robots" content="noindex, nofollow"></head>', "http://x.com/")
    assert r.analysis.index is False
    assert r.analysis.follow is False
    r2 = html_lex('<head><meta name="robots" content="all"></head>', "http://x.com/")
    assert r2.analysis.index is True and r2.analysis.follow is True


def test_meta_charset():
    r = html_lex(
        '<head><meta http-equiv="Content-Type" content="text/html; charset=utf-8"></head>',
        "http://x.com/",
    )
    assert r.analysis.charset == b"utf-8"


def test_feed_links():
    html = (
        '<head><link rel="alternate" type="application/rss+xml" href="/feed.rss">'
        '<link rel="alternate" type="application/atom+xml" href="http://x.com/atom">'
        '<link rel="alternate" type="text/xml" href="/old.xml"></head>'
    )
    r = html_lex(html, "http://x.com/")
    assert r.analysis.rss2 == b"http://x.com/feed.rss"
    assert r.analysis.atom == b"http://x.com/atom"
    assert r.analysis.rss == b"http://x.com/old.xml"


def test_bad_link_dropped_silently():
    r = html_lex('<body><a href="http://bad host/">A</a></body>', "http://x.com/")
    assert r.links == []


def test_title_before_body_then_text_off():
    # op_title_c resets GET_TEXT; only body re-enables (HTML_lexer.cc:443-447)
    r = html_lex("<html><head><title>T</title>ignored</head><body>B</body></html>", "http://x.com/")
    assert r.text == b"\nT\nB"


def test_no_body_tag_text_still_extracted():
    # html_lex passes get_text_if_body_tag_only=False (HTML_lexer.cc:846)
    r = html_lex("hello world", "http://x.com/")
    assert r.text == b"hello world"


def test_attr_without_quotes_and_tag_close_variants():
    r = html_lex("<body>a<br/>b</body>", "http://x.com/")
    assert r.text == b"\na\nb"


def test_markup_decl_ignored():
    r = html_lex("<!DOCTYPE html><body>x</body>", "http://x.com/")
    assert r.text == b"\nx"


def test_pi_ignored():
    r = html_lex('<?xml version="1.0"?><body>x</body>', "http://x.com/")
    assert r.text == b"\nx"


def test_cdata_dropped():
    # CDATA content dropped; the trailing ']]>' re-scans in INITIAL: followed
    # by '<' the data run ties at 3 chars and the earlier marked-section rule
    # wins (html.ll:220 < 277) → dropped
    r = html_lex("<body>a<![CDATA[hidden]]><p>b</p></body>", "http://x.com/")
    assert r.text == b"\na\nb\n"
    # ...but followed by more data the longer data run WINS and ']]>' leaks
    # into the text (flex longest-match)
    r2 = html_lex("<body>a<![CDATA[hidden]]>b</body>", "http://x.com/")
    assert r2.text == b"\na]]>b"


def test_stray_lt_is_data():
    r = html_lex("<body>1 < 2</body>", "http://x.com/")
    assert r.text == b"\n1 < 2"


def test_newlines_are_data():
    r = html_lex("<body>a\nb</body>", "http://x.com/")
    assert r.text == b"\na\nb"


def test_unclosed_tag_interrupted_by_new_tag():
    # '<foo<p>' — STAGO in ATTR: process pending, '<' consumed, 'p>' is data
    r = html_lex("<body>a<foo<p>b</body>", "http://x.com/")
    assert r.text == b"\nap>b"


def test_end_tag_trailing_tab_quirk():
    # trim strips 0x20/0x11/\n/\r but NOT tab (html.ll:146-151) → tag name
    # 'body\t' doesn't dispatch op_body_c
    r = html_lex("<body>a</body\t><p>b</p>", "http://x.com/")
    # body close ignored → get_text stays on → 'b' still emitted
    assert r.text == b"\na\nb\n"


def test_first_byte_dispatch_equals_full_rule_scan():
    """The precomputed (condition, first-byte) rule subsets must be
    behavior-identical to scanning every rule: same text, links, warnings
    and analysis on a corpus that exercises TAG/ATTR/ATTRVAL/SCRIPT/MD/
    COM/DS/CDATA edges (quotes, unterminated literals, stray '<' inside
    attribute values, \\r runs, NET tags, marked sections)."""
    import mycelium_spark.functions.lexer as L
    from mycelium_spark.sources import synth

    docs = [synth.page_html(i, 200, 2) for i in range(12)]
    docs += [
        b"<a href='x<y'>t</a>", b"<a href=a/b>x</a>", b"<a href=/>y</a>",
        b"<p \r\r x=1>", b"<p/>", b"<p / >", b"<![CDATA[ab]]>x",
        b"<b x='un", b"<a b=\r>", b"<x y z=>", b"< notag",
        b"<a b c='d'e>", b"text ]]> more", b"<script>x<y</script>z",
        b"<!doctype html><!-- c -->|", b"<?pi?>t", b"<a\nhref=u>v</a>",
        b"<md ![x]>", b"\x11<t>\x11</t>", b"<a href=\"q>r\">s</a>",
    ]

    def lex_all():
        out = []
        for d in docs:
            r = L.html_lex(d, b"http://h.example/")
            out.append((r.text, tuple(r.links), r.warnings, r.analysis.title))
        return out

    full = {c: tuple(rules for _ in range(256)) for c, rules in L._RULES.items()}
    with_dispatch = lex_all()
    saved = L._DISPATCH
    try:
        L._DISPATCH = full
        without = lex_all()
    finally:
        L._DISPATCH = saved
    assert with_dispatch == without


def test_dispatch_subsets_are_conservative():
    """Every rule regex that matches at some position must be present in
    the dispatch row of that position's first byte (soundness probe over
    all rules x all 256 single bytes plus per-rule witness strings)."""
    import mycelium_spark.functions.lexer as L

    probes = [bytes([b]) for b in range(256)]
    # multi-byte witnesses for rules whose first match needs context
    probes += [b"/>", b"]]>", b"--  >", b"</ script >", b"<!--", b"name=",
               b"'q'", b'"q"', b"\r\n", b"%x;"]
    for cond, rules in L._RULES.items():
        for probe in probes:
            for rule in rules:
                if rule[1].match(probe):
                    assert rule in L._DISPATCH[cond][probe[0]], (
                        cond, probe, rule[0],
                    )
