"""HTML block segmentation: boundary semantics, link-char accounting,
and the reconstruction invariant against the parity lexer's whole-text
output (blocks are a partition of html_lex text, never a reimplementation)."""

import pytest

from mycelium_spark.functions.blocks import html_blocks
from mycelium_spark.functions.lexer import html_lex
from mycelium_spark.operators import boilerplate

HTML = (
    b"<html><head><title>T7</title></head><body>"
    b"<div><a href='/a'>home</a> <a href='/b'>about</a></div>"
    b"<p>the data of spark is fast</p>"
    b"<p>copyright 2026 example corp</p>"
    b"</body></html>"
)


def test_basic_segmentation():
    assert html_blocks(HTML) == [
        (0, b"T7", 0),
        (1, b"home about", 9),
        (2, b"the data of spark is fast", 0),
        (3, b"copyright 2026 example corp", 0),
    ]


def test_reconstruction_matches_html_lex():
    # normalized block concatenation == normalized whole-document text:
    # segmentation only PARTITIONS the parity lexer's emission
    for html in (
        HTML,
        b"no tags at all, just text",
        b"<ul><li>one</li><li>two</li></ul>tail",
        b"<p>a<br>b</p><div>c<span>d</span></div>",
        b"<table><tr><td>x</td><td>y</td></tr></table>",
    ):
        blocks = html_blocks(html)
        joined = b" ".join(t for _, t, _ in blocks)
        assert joined == b" ".join(html_lex(html).text.split()), html


def test_tagless_text_is_one_trailing_block():
    assert html_blocks(b"just plain text") == [(0, b"just plain text", 0)]


def test_anchor_spanning_a_block_boundary_splits_link_chars():
    # the <a> stays open across the <p> flush; each side counts its own
    html = b"<a href='/x'>left<p>right</p></a>"
    assert html_blocks(html) == [(0, b"left", 4), (1, b"right", 5)]


def test_whitespace_only_blocks_dropped():
    html = b"<div>  \n\t </div><p>real</p>"
    assert html_blocks(html) == [(0, b"real", 0)]


def test_extract_blocks_operator(spark):
    pages = spark.createDataFrame(
        [(1, bytearray(HTML)), (2, None)], "doc_id long, html binary"
    )
    rows = sorted(
        (r["doc_id"], r["block_id"], r["text"], r["link_chars"])
        for r in boilerplate.extract_blocks(pages).collect()
    )
    assert rows == [
        (1, 0, "T7", 0),
        (1, 1, "home about", 9),
        (1, 2, "the data of spark is fast", 0),
        (1, 3, "copyright 2026 example corp", 0),
    ]


def test_extract_blocks_feeds_classifier(spark):
    pages = spark.createDataFrame(
        [(1, bytearray(HTML))], "doc_id long, html binary"
    )
    cls = {
        r["block_id"]: r["cls_cf"]
        for r in boilerplate.classify_blocks(
            boilerplate.extract_blocks(pages)
        ).collect()
    }
    # title/footer short, nav short-but-linked -> bad, body short (<70)
    assert cls == {0: "short", 1: "bad", 2: "short", 3: "short"}


def test_reconstruction_invariant_over_synth_corpus():
    # property pin over the REAL crawl corpus generator: for every page
    # the block texts are a partition of the parity lexer's whole-text
    # emission (none of the 200 synthetic pages, with their nav/para/link
    # structure, may fuse or drop a word)
    from mycelium_spark.sources import synth

    n = 200
    for pid in range(n):
        html = synth.page_html(pid, n, extra_paras=pid % 3)
        blocks = html_blocks(html)
        joined = b" ".join(t for _, t, _ in blocks)
        assert joined == b" ".join(html_lex(html).text.split()), pid
        # link accounting never exceeds the block's raw text mass
        for _, t, lc in blocks:
            assert 0 <= lc <= max(len(t) + 64, 64), (pid, t, lc)


def test_block_lexer_keeps_fast_dispatch():
    """The segmenter hooks the base lexer via flush_tags (not a process()
    override), so the inlined fast dispatch paths stay enabled for the
    boilerplate pipeline; the text micro-inlines are correctly disabled
    because the subclass overrides text emission."""
    from mycelium_spark.functions.blocks import _BlockLexer
    from mycelium_spark.functions.lexer import HtmlLexer

    lx = _BlockLexer(b"<p>x</p>", None)
    assert lx.fast is True
    assert lx.plain is False
    assert HtmlLexer(b"<p>x</p>", None).plain is True
