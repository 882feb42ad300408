"""HTML block segmentation: the lexer-backed front end of the jusText
boilerplate pass (operators/boilerplate.py).

jusText classifies BLOCKS — contiguous text between block-level tags,
with the fraction of characters inside <a> elements as the link-density
signal (Pomikálek 2011 §3.2). The parity lexer (lexer.py, H1-H7) already
tokenizes tags and tracks in-link state for anchor text; this module
layers block segmentation ON TOP of it as a subclass — the parity
lexer's token stream, entity replacement, and text emission are reused
untouched, so whole-document extraction (html_lex) keeps its byte-exact
behavior and the segmenter can never drift from it: concatenating block
texts (plus title/whitespace normalization) is the same text html_lex
emits.

Semantics:
* a block flushes at every START or END of a block-level tag
  (BLOCK_TAGS — the HTML block-rendering elements plus head/title/body
  structure tags);
* block text is whitespace-normalized (runs of ASCII whitespace → one
  space, trimmed) — jusText's own preprocessing;
* link_chars counts raw text bytes emitted while the lexer is inside an
  <a> element (before normalization — the count is deterministic, and
  only the 0.2 link-density threshold consumes it);
* whitespace-only blocks are dropped; surviving blocks number 0..k-1
  in document order.
"""

from __future__ import annotations

from .lexer import START, END, HtmlLexer
from .url import Url

BLOCK_TAGS = frozenset(
    t.encode()
    for t in (
        "address article aside blockquote body dd div dl dt fieldset "
        "figcaption figure footer form h1 h2 h3 h4 h5 h6 head header hr "
        "html li main nav ol p pre section table tbody td tfoot th thead "
        "title tr ul"
    ).split()
)


class _BlockLexer(HtmlLexer):
    __slots__ = ("blocks", "_parts", "_link_chars")

    # declarative flush hook: the base lexer (and its inlined fast
    # dispatch paths) calls flush_block() whenever a flushed batch starts
    # with a START/END of a block tag — identical to the former process()
    # override, but keeps the fast paths enabled for segmentation
    flush_tags = BLOCK_TAGS

    def __init__(self, buf: bytes, base: Url | None):
        super().__init__(buf, base)
        self.blocks: list[tuple[bytes, int]] = []
        self._parts: list[bytes] = []
        self._link_chars = 0

    def text_add(self, text: bytes) -> None:
        super().text_add(text)
        self._parts.append(text)
        if self.inlink:
            self._link_chars += len(text)

    def text_word_break(self) -> None:
        # non-block word-break tags (br, img, ...) separate words in the
        # lexer's text; mirror the separator or block text would fuse them
        had = self.did_word_break
        super().text_word_break()
        if not had:
            self._parts.append(b" ")

    def flush_block(self) -> None:
        txt = b" ".join(b"".join(self._parts).split())
        if txt:
            self.blocks.append((txt, self._link_chars))
        self._parts = []
        self._link_chars = 0


def html_blocks(
    html: bytes | str, base_url: bytes | str = b""
) -> list[tuple[int, bytes, int]]:
    """→ [(block_id, text, link_chars)] for one HTML document. Same
    base_url contract as html_lex (empty → links unresolved)."""
    if isinstance(html, str):
        html = html.encode("utf-8")
    if isinstance(base_url, str):
        base_url = base_url.encode("utf-8")
    base: Url | None = None
    if base_url:
        base = Url(base_url)
        if not base.absolute():
            raise ValueError(f"base_url: {base_url!r} is not absolute")
    lexer = _BlockLexer(html, base)
    lexer.run()
    lexer.flush_block()  # trailing text after the last block tag
    return [(i, t, lc) for i, (t, lc) in enumerate(lexer.blocks)]
