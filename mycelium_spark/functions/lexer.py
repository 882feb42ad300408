"""HTML lexer: text + link extraction — exact-parity kernel.

From-scratch Python reimplementation of the reference SGML scanner
(behavioral spec: /root/reference/src/html_lexer/html.ll and
HTML_lexer.cc). The flex scanner's longest-match / first-rule-on-tie
dispatch is reproduced mechanically per start condition, including its
quirks, because the extracted ``text`` must be byte-identical:

* tag-name trims strip 0x20/0x11/0x0A/0x0D — NOT tab (html.ll:146-151,
  234-239: the scanner says 0x11 where SEPCHAR is 0x09);
* a start tag whose name is any prefix of "script" enters script mode
  (html.ll:240: ``strncasecmp(yytext,"script",yyleng)``);
* after ``</script>`` the END token waits for the next batch flush, so DATA
  immediately following it is dropped (html.ll:156-179 never calls process);
* word-break tags emit a single ``\\n`` deduped by ``did_word_break``
  (HTML_lexer.cc:255-264); ``span`` is NOT a break tag (HTML_lexer.cc:103);
* unquoted attribute values that are pure name-characters become NMTOKEN,
  not LITERAL, so ``href=foo`` yields NO link (html.ll:318-321 precedes 347);
* only the first token of a flushed batch drives dispatch
  (HTML_lexer.cc:744-764), so tokens queued without a process() call are
  silently dropped;
* op_a/op_frame match attributes by PREFIX: ``hreflang`` counts as ``href``,
  ``srcset`` as ``src`` (HTML_lexer.cc:520,533,573);
* resolved links are normalized before merging; the merged result is NOT
  re-normalized (HTML_lexer.cc:266-297); bytes <= 0x08 are stripped from
  emitted link records (HTML_lexer.cc:822-830).

The scanner operates on bytes and returns text as bytes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .entities import replace_all_entities
from .url import DOTSEG_RE as _URL_DOTSEG
from .url import NORMALIZED_ABS_RE as _URL_CANON
from .url import BadUrl, Url

# --- token types (HTML_lexer.hh:140-151) ---
DATA = 1
START = 2
END = 3
TAGC = 4
ATTRNAME = 5
NAME = 6
NUMBER = 7
NMTOKEN = 8
LITERAL = 9
PI = 13
MARKUP_DECL = 14

# --- start conditions ---
INITIAL, CDATA, TAG, ATTR, ATTRVAL, SCRIPT, MD, COM, DS = range(9)

_WS = rb"[ \t\n\r]*"
_NAME = rb"[A-Za-z_:][A-Za-z0-9._:\-]*"

# trim sets (html.ll:146-151 etc.): space, 0x11 (sic), LF, CR
_TRIM_TAIL = frozenset((0x20, 0x11, 0x0A, 0x0D))
_TRIM_TAIL_GT = frozenset((0x20, 0x11, 0x0A, 0x0D, 0x3E))
# C isspace for the ATTRNAME trim (html.ll:302)
_ISSPACE = frozenset((0x20, 0x09, 0x0A, 0x0B, 0x0C, 0x0D))


def _rtrim(b: bytes, chars: frozenset[int]) -> bytes:
    n = len(b)
    while n and b[n - 1] in chars:
        n -= 1
    return b[:n]


# Rules per condition: list of (rule_order, compiled_regex, action_name).
# rule_order = source line in html.ll; ties in match length go to the
# lowest order (flex first-rule-wins).
_R = re.compile


def _rules(*rules):
    return tuple(rules)


_RULES = {
    INITIAL: _rules(
        (141, _R(rb"</" + _NAME + _WS), "i_etago_name"),
        (190, _R(rb"</>"), "warn"),
        (195, _R(rb"<!" + _NAME + _WS), "i_mdo_name"),
        (202, _R(rb"<!>"), "i_process"),
        (207, _R(rb"<!--"), "i_mdo_com"),
        (214, _R(rb"<!\[" + _WS), "i_mdo_dso"),
        (220, _R(rb"\]\]>"), "warn"),
        (225, _R(rb"<\?[^>]*>"), "i_pi"),
        (230, _R(rb"<" + _NAME + _WS), "i_stago_name"),
        (252, _R(rb"<>"), "warn"),
        (256, _R(rb"<!\[CDATA\[", re.I), "i_cdatao"),
        (277, _R(rb"[^<]+|[^\n]"), "i_data"),
        (474, _R(rb"[\n\r]+"), "noop"),
        (478, _R(rb"[^\n]"), "warn"),
    ),
    SCRIPT: _rules(
        (156, _R(rb"</" + _WS + rb"[Ss][Cc][Rr][Ii][Pp][Tt]" + _WS + rb">"), "s_script_end"),
        (282, _R(rb"[^<]+|[^\n]"), "noop"),
        (474, _R(rb"[\n\r]+"), "noop"),
        (478, _R(rb"[^\n]"), "warn"),
    ),
    TAG: _rules(
        (366, _R(rb">"), "t_tagc"),
        (381, _R(rb"<"), "t_stago"),
        (388, _R(rb"[^\n]"), "warn"),
        (474, _R(rb"[\n\r]+"), "noop"),
    ),
    ATTR: _rules(
        (299, _R(_NAME + rb"[ \t\n\r]*=" + _WS), "a_attrname"),
        (312, _R(_NAME + _WS), "a_name"),
        (366, _R(rb">"), "t_tagc"),
        (373, _R(rb"/>"), "t_net_tagc"),
        (381, _R(rb"<"), "t_stago"),
        (388, _R(rb"[^\n]"), "warn"),
        (474, _R(rb"[\n\r]+"), "noop"),
    ),
    ATTRVAL: _rules(
        (318, _R(rb"[A-Za-z0-9._:\-]+" + _WS), "v_nmtoken"),
        (324, _R(rb"(\"[^\"]*\"|'[^']*')" + _WS), "v_literal"),
        (347, _R(rb"[^ '\"\t\n>]+" + _WS), "v_unquoted"),
        (360, _R(rb">"), "v_tagc"),
        (373, _R(rb"/>"), "t_net_tagc"),
        (381, _R(rb"<"), "t_stago"),
        (388, _R(rb"[^\n]"), "warn"),
        (474, _R(rb"[\n\r]+"), "noop"),
    ),
    MD: _rules(
        (404, _R(rb"%" + _NAME + rb"(;|\n)?" + _WS), "warn"),
        (412, _R(rb"[0-9]+" + _WS), "m_number"),
        (416, _R(_NAME + _WS), "m_name"),
        (420, _R(rb"(\"[^\"]*\"|'[^']*')" + _WS), "m_literal"),
        (424, _R(rb">"), "t_tagc"),
        (438, _R(rb"\["), "m_dso"),
        (446, _R(rb"[^\n]"), "warn"),
        (474, _R(rb"[\n\r]+"), "noop"),
    ),
    COM: _rules(
        (430, _R(rb"--" + _WS + rb">"), "c_com_end"),
        (442, _R(rb"[^\n]"), "noop"),
        (474, _R(rb"[\n\r]+"), "noop"),
    ),
    DS: _rules(
        (460, _R(rb"\]\]>"), "d_msc_mdc"),
        (464, _R(rb"\]"), "d_dsc"),
        (466, _R(rb"[^\]]+"), "warn"),
        (474, _R(rb"[\n\r]+"), "noop"),
        (478, _R(rb"[^\n]"), "warn"),
    ),
    CDATA: _rules(
        # trailing context: consumed length excludes ']]>' but the tie-break
        # length includes it (flex DFA measures the full pattern)
        (262, _R(rb"[^\n]*(?=\]\]>)"), "cd_data"),
        (269, _R(rb"\]\]>"), "cd_close"),
        (470, _R(rb"[^\n]"), "warn"),
        (474, _R(rb"[\n\r]+"), "noop"),
    ),
}

# word-break tag set (HTML_lexer.cc:87-181); 'span' and 'title' excluded.
_WORD_BREAK_TAGS = frozenset(
    t.encode()
    for t in (
        "applet base blockquote br button caption dd div dfn dl dt fieldset "
        "form h1 head hr img input li map menu noframes object ol optgroup "
        "option p param pre q samp select table tbody td textarea tfoot th "
        "thead tr tt ul xmp"
    ).split()
)

_LOW_BYTES = bytes(range(9))  # 0x00-0x08
_META_REFRESH_RE = re.compile(rb"^\d+; url=(.+)$", re.I)
# HTTP token chars: not CTL, not separators (HTML_lexer.cc:27-32)
_CHARSET_RE = re.compile(rb"charset=([^\x00-\x1f\x7f()<>@,;:\\\"/\[\]?={}\t]+)")
_BOOST_TRIM = b" \t\n\v\f\r"


@dataclass
class Analysis:
    """Meta info from lexical analysis (HTML_lexer.hh:64-84)."""

    title: bytes = b""
    rss2: bytes = b""
    rss: bytes = b""
    atom: bytes = b""
    charset: bytes = b""
    index: bool = True
    follow: bool = True


@dataclass
class ProcHTML:
    """html_lex result (python export: common_python.cc:98-115)."""

    base_url: bytes = b""
    text: bytes = b""
    links: list = field(default_factory=list)  # [(url: bytes, txt: bytes)]
    warnings: int = 0
    analysis: Analysis = field(default_factory=Analysis)


class HtmlLexer:
    """One-shot scanner; construct and call :meth:`run`.

    Subclass hooks: ``flush_tags`` (a frozenset of tag names) makes
    :meth:`process` call :meth:`flush_block` before dispatch whenever the
    flushed batch starts with a START/END of one of those tags — the
    declarative form of overriding process(), and the fast dispatch paths
    honor it; overriding ``text_add``/``text_word_break`` disables only
    the word-break/data micro-inlines, not the fast paths themselves.
    """

    flush_tags: frozenset | None = None

    __slots__ = (
        "buf", "pos", "cond", "tokens", "text_parts", "links", "warnings",
        "analysis", "base_url", "get_text", "get_title", "inlink",
        "link_nofollow", "did_word_break", "cur_url", "cur_txt", "fast",
        "plain",
    )

    def __init__(self, buf: bytes, base_url: Url | None):
        self.buf = buf
        self.pos = 0
        self.cond = INITIAL
        self.tokens: list[tuple[int, bytes]] = []
        self.text_parts: list[bytes] = []
        self.links: list[tuple[bytes, bytes]] = []
        self.warnings = 0
        self.analysis = Analysis()
        self.base_url = base_url
        # html_lex passes get_text_if_body_tag_only=False (HTML_lexer.cc:846)
        self.get_text = True
        self.get_title = False
        self.inlink = False
        self.link_nofollow = False
        self.did_word_break = False
        self.cur_url = b""
        self.cur_txt = b""
        # inlined-dispatch fast paths are only sound when process() is
        # not overridden (subclasses use the flush_tags hook instead);
        # the data/word-break micro-inlines additionally need the base
        # text emission methods
        cls = type(self)
        self.fast = cls.process is HtmlLexer.process
        self.plain = (
            cls.text_add is HtmlLexer.text_add
            and cls.text_word_break is HtmlLexer.text_word_break
            and cls.link_text_add is HtmlLexer.link_text_add
        )

    # --- main loop ---
    def run(self) -> None:
        # ``pos``/``cond`` live in locals for the whole scan: no tag op,
        # process(), or text hook touches self.pos/self.cond (only the
        # generic rule ACTIONS do), so state syncs to the instance only
        # around generic-action calls and at EOF.
        buf = self.buf
        n = len(buf)
        find = buf.find
        pos = self.pos
        cond = self.cond
        while pos < n:
            if cond == INITIAL:
                c = buf[pos]
                if c != 0x3C and c != 0x5D:  # not '<' nor ']' → data fast path
                    end = find(b"<", pos)
                    if end == -1:
                        end = n
                    raw = buf[pos:end]
                    pos = end
                    # inline _data+process for the common no-pending-token
                    # case (a queued token — e.g. the </script> END — must
                    # keep driving dispatch, so fall back when one exists)
                    if self.tokens or not self.fast:
                        self._data(raw)
                    elif self.get_text:
                        content = replace_all_entities(raw)
                        if self.plain:
                            if self.get_title:
                                self.analysis.title += content
                            self.text_parts.append(content)
                            self.did_word_break = False
                            if self.inlink:
                                self.cur_txt += content
                        elif self.inlink:
                            self.link_text_add(content)
                        else:
                            self.text_add(content)
                    continue
                if c == 0x5D:  # ']' — MSC_MDC ties the 3-char data run
                    end = find(b"<", pos)
                    if end == -1:
                        end = n
                    if end - pos == 3 and buf.startswith(b"]]>", pos):
                        self.warn()  # unmatched marked section end (html.ll:220)
                        pos = pos + 3
                    else:
                        self._data(buf[pos:end])
                        pos = end
                    continue
                # '<': dispatch on the second byte (rule prefixes partition)
                c2 = buf[pos + 1] if pos + 1 < n else -1
                if 65 <= c2 <= 90 or 97 <= c2 <= 122 or c2 == 95 or c2 == 58:
                    # name-start → rule 230 '<NAME ws*' is the unique match
                    end = _STAGO_RE.match(buf, pos).end()
                    # NAME chars exclude '&', so addtoken's entity pass is a
                    # no-op: the stored token is exactly the lowered name
                    nm = buf[pos + 1 : end]
                    if nm[-1] in _TRIM_TAIL:
                        nm = _rtrim(nm, _TRIM_TAIL)
                    low = nm.lower()
                    pos = end
                    if b"script".startswith(low):
                        self.tokens.append((START, low))
                        self.process()
                        cond = SCRIPT
                        continue
                    # most tags carry no attributes: '>' right after the name
                    # is exactly ATTR rule 366 → t_tagc (addtoken+process).
                    # With no pending token, NO tag op reads the token list
                    # for an attribute-less tag (the ATTRNAME scans and
                    # tag_map see zero attributes either way), so the
                    # [START, TAGC] batch need not be built at all.
                    if end < n and buf[end] == 0x3E and self.fast and not self.tokens:
                        pos = end + 1
                        ft = self.flush_tags
                        if ft is not None and low in ft:
                            self.flush_block()
                        op = _STAG_OPS.get(low)
                        if op is _WB_OP:
                            # inline word_break (plain ⇒ base hooks)
                            if self.get_text:
                                if self.inlink:
                                    self.cur_txt += b" "
                                elif self.plain:
                                    if not self.did_word_break:
                                        self.text_parts.append(b"\n")
                                        self.did_word_break = True
                                else:
                                    self.text_word_break()
                        elif op is not None:
                            op(self)
                        continue
                    self.tokens.append((START, low))
                    if end < n and buf[end] == 0x3E:
                        # pending pre-START token (or an overriding
                        # subclass) drives dispatch: generic path
                        pos = end + 1
                        self.tokens.append((TAGC, b">"))
                        self.process()
                    else:
                        cond = ATTR
                    continue
                if c2 == 0x2F:  # '</'
                    c3 = buf[pos + 2] if pos + 2 < n else -1
                    if 65 <= c3 <= 90 or 97 <= c3 <= 122 or c3 == 95 or c3 == 58:
                        # rule 141 '</NAME ws*' is the unique match
                        end = _ETAGO_RE.match(buf, pos).end()
                        nm = buf[pos + 2 : end]
                        if nm[-1] in _TRIM_TAIL:
                            nm = _rtrim(nm, _TRIM_TAIL)
                        low = nm.lower()
                        pos = end
                        # '>' right after → TAG rule 366 → t_tagc; close
                        # ops never read the token list, so skip building
                        # the [END, TAGC] batch when nothing is pending
                        if end < n and buf[end] == 0x3E and self.fast and not self.tokens:
                            pos = end + 1
                            ft = self.flush_tags
                            if ft is not None and low in ft:
                                self.flush_block()
                            op = _CTAG_OPS.get(low)
                            if op is _WB_OP:
                                if self.get_text:
                                    if self.inlink:
                                        self.cur_txt += b" "
                                    elif self.plain:
                                        if not self.did_word_break:
                                            self.text_parts.append(b"\n")
                                            self.did_word_break = True
                                    else:
                                        self.text_word_break()
                            elif op is not None:
                                op(self)
                            continue
                        self.tokens.append((END, low))
                        if end < n and buf[end] == 0x3E:
                            pos = end + 1
                            self.tokens.append((TAGC, b">"))
                            self.process()
                        else:
                            cond = TAG
                        continue
                    if c3 == 0x3E:  # '</>' — rule 190
                        self.warn()
                        pos = pos + 3
                        continue
                    # no rule matches: stray '<' → rule 277 one DATA char
                    self._data(buf[pos : pos + 1])
                    pos = pos + 1
                    continue
                subset = _INITIAL_LT.get(buf[pos + 1 : pos + 2], _INITIAL_LT_DEFAULT)
                best_len = -1
                best_action = None
                best_consume = 0
                for order, rx, action in subset:
                    m = rx.match(buf, pos)
                    if m is None:
                        continue
                    consume = m.end() - pos
                    if consume > best_len:
                        best_len = consume
                        best_action = action
                        best_consume = consume
                if best_action is None:
                    # stray '<': rule 277's '.' alternative → one DATA char
                    self._data(buf[pos : pos + 1])
                    pos = pos + 1
                else:
                    text = buf[pos : pos + best_consume]
                    self.pos = pos + best_consume
                    self.cond = cond
                    best_action(self, text)
                    pos = self.pos
                    cond = self.cond
                continue
            c = buf[pos]
            if c == 0x3E:
                # '>' closes the tag in every attribute condition: TAG/ATTR
                # rule 366 → t_tagc, ATTRVAL rule 360 → v_tagc (no TAGC token)
                if cond == ATTR or cond == TAG:
                    pos = pos + 1
                    self.tokens.append((TAGC, b">"))
                    self.process()
                    cond = INITIAL
                    continue
                if cond == ATTRVAL:
                    pos = pos + 1
                    self.process()
                    cond = INITIAL
                    continue
            best_len = -1
            best_action = None
            best_consume = 0
            for order, rx, action in _DISPATCH[cond][c]:
                m = rx.match(buf, pos)
                if m is None:
                    continue
                consume = m.end() - pos
                efflen = consume
                if order == 262:  # CDATA trailing context: ']]>' counts
                    efflen = consume + 3
                if efflen > best_len:
                    best_len = efflen
                    best_action = action
                    best_consume = consume
                # equal length → earlier rule already chosen (list is ordered)
            if best_action is None:
                # flex default rule: echo char (never reached — [^\n] + [\n\r]+
                # cover everything); skip defensively
                pos += 1
                continue
            text = buf[pos : pos + best_consume]
            self.pos = pos + best_consume
            self.cond = cond
            best_action(self, text)
            pos = self.pos
            cond = self.cond
        self.pos = pos
        self.cond = cond
        # EOF: finalize() is a no-op; pending tokens dropped (html.ll:483-487)

    # --- token plumbing (HTML_lexer.cc:184-198) ---
    def addtoken(self, toktype: int, content: bytes, ci: bool = False) -> None:
        s = replace_all_entities(content)
        if ci:
            s = s.lower()
        self.tokens.append((toktype, s))

    def warn(self, _text: bytes = b"") -> None:
        self.warnings += 1

    def noop(self, _text: bytes = b"") -> None:
        pass

    # --- INITIAL actions ---
    def i_etago_name(self, text: bytes) -> None:
        t = _rtrim(text[2:], _TRIM_TAIL)
        self.addtoken(END, t, ci=True)
        self.cond = TAG

    def i_mdo_name(self, text: bytes) -> None:
        self.addtoken(MARKUP_DECL, text, ci=True)
        self.cond = MD

    def i_process(self, _text: bytes) -> None:
        self.process()

    def i_mdo_com(self, _text: bytes) -> None:
        self.cond = COM

    def i_mdo_dso(self, text: bytes) -> None:
        self.warn(text)
        self.cond = DS

    def i_pi(self, text: bytes) -> None:
        self.addtoken(PI, text)
        self.process()

    def i_stago_name(self, text: bytes) -> None:
        t = _rtrim(text[1:], _TRIM_TAIL)
        # strncasecmp(yytext,"script",yyleng): any prefix of "script" matches
        if b"script".startswith(t.lower()):
            self.addtoken(START, t, ci=True)
            self.process()
            self.cond = SCRIPT
        else:
            self.addtoken(START, t, ci=True)
            self.cond = ATTR

    def i_cdatao(self, text: bytes) -> None:
        self.warn(text)
        self.cond = CDATA

    def i_data(self, text: bytes) -> None:
        self._data(text)

    def _data(self, text: bytes) -> None:
        self.addtoken(DATA, text)
        self.process()

    # --- SCRIPT ---
    def s_script_end(self, text: bytes) -> None:
        t = text[2:]
        i = 0
        while i < len(t) and t[i] == 0x20:
            i += 1
        t = _rtrim(t[i:], _TRIM_TAIL_GT)
        self.addtoken(END, t, ci=True)
        # NOTE: no process() — token waits for next flush (html.ll:156-179)
        self.cond = INITIAL

    # --- TAG/ATTR shared ---
    def t_tagc(self, text: bytes) -> None:
        self.addtoken(TAGC, text)
        self.process()
        self.cond = INITIAL

    def t_net_tagc(self, text: bytes) -> None:
        self.addtoken(TAGC, text)
        self.process()
        self.cond = INITIAL

    def t_stago(self, _text: bytes) -> None:
        self.process()
        self.cond = INITIAL

    # --- ATTR ---
    def a_attrname(self, text: bytes) -> None:
        t = text
        n = len(t)
        while n and (t[n - 1] == 0x3D or t[n - 1] in _ISSPACE):
            n -= 1
        self.addtoken(ATTRNAME, t[:n], ci=True)
        self.cond = ATTRVAL

    def a_name(self, text: bytes) -> None:
        self.addtoken(NAME, text, ci=True)

    # --- ATTRVAL ---
    def v_nmtoken(self, text: bytes) -> None:
        self.addtoken(NMTOKEN, text)
        self.cond = ATTR

    def v_literal(self, text: bytes) -> None:
        t = _rtrim(text, _TRIM_TAIL)
        if t and t[-1] in (0x22, 0x27):
            t = t[:-1]
        if t and t[0] in (0x22, 0x27):
            t = t[1:]
        self.addtoken(LITERAL, t)
        self.cond = ATTR

    def v_unquoted(self, text: bytes) -> None:
        t = _rtrim(text, _TRIM_TAIL)
        self.addtoken(LITERAL, t)
        self.cond = ATTR

    def v_tagc(self, _text: bytes) -> None:
        self.process()  # no TAGC token (html.ll:360-363)
        self.cond = INITIAL

    # --- MD ---
    def m_number(self, text: bytes) -> None:
        self.addtoken(NUMBER, text)

    def m_name(self, text: bytes) -> None:
        self.addtoken(NAME, text, ci=True)

    def m_literal(self, text: bytes) -> None:
        self.addtoken(LITERAL, text)

    def m_dso(self, _text: bytes) -> None:
        self.cond = DS

    # --- COM ---
    def c_com_end(self, _text: bytes) -> None:
        self.process()
        self.cond = INITIAL

    # --- DS ---
    def d_msc_mdc(self, _text: bytes) -> None:
        self.cond = INITIAL

    def d_dsc(self, _text: bytes) -> None:
        self.cond = COM

    # --- CDATA ---
    def cd_data(self, _text: bytes) -> None:
        self.process()
        self.cond = INITIAL

    def cd_close(self, _text: bytes) -> None:
        self.cond = INITIAL

    # --- dispatch (HTML_lexer.cc:730-788) ---
    def process(self) -> None:
        tokens = self.tokens
        if not tokens:
            return
        ttype, content = tokens[0]
        ft = self.flush_tags
        if ft is not None and (ttype == START or ttype == END) and content in ft:
            self.flush_block()
        if ttype == START:
            op = _STAG_OPS.get(content)
            if op is not None:
                op(self)
        elif ttype == END:
            op = _CTAG_OPS.get(content)
            if op is not None:
                op(self)
        elif ttype == DATA:
            if self.get_text:
                if self.inlink:
                    self.link_text_add(content)
                else:
                    self.text_add(content)
        self.tokens = []

    def flush_block(self) -> None:  # pragma: no cover - flush_tags hook
        raise NotImplementedError("flush_tags set without flush_block")

    # --- text/link emission (HTML_lexer.cc:244-327) ---
    def text_add(self, text: bytes) -> None:
        if self.get_title:
            self.analysis.title += text
        self.text_parts.append(text)
        self.did_word_break = False

    def text_word_break(self) -> None:
        if not self.did_word_break:
            self.text_parts.append(b"\n")
            self.did_word_break = True

    def link_text_add(self, text: bytes) -> None:
        self.text_add(text)
        self.cur_txt += text

    def word_break(self) -> None:
        if self.get_text:
            if self.inlink:
                self.cur_txt += b" "
            else:
                self.text_word_break()

    def link_add(self, link: bytes) -> None:
        if self.base_url is not None:
            # canonical-form screen (same invariant as the vectorized URL
            # normalizer's fast path): a match is absolute and
            # normalize()-invariant, so Url(link).normalize().get() == link
            if _URL_CANON.fullmatch(link) is not None and _URL_DOTSEG.search(link) is None:
                self.cur_url = link
                return
            try:
                url = Url(link)
                url.normalize()
                if url.absolute():
                    self.cur_url = url.get()
                else:
                    full = self.base_url.copy()
                    full.merge_ref(url)
                    self.cur_url = full.get()
            except (BadUrl, ValueError):
                self.cur_url = b""
                self.cur_txt = b""
        else:
            self.cur_url = link

    def submit_link(self) -> None:
        if self.cur_url:
            # strip bytes <= 0x08 (link record serializer, HTML_lexer.cc:822-830)
            url = self.cur_url.translate(None, _LOW_BYTES)
            txt = self.cur_txt.translate(None, _LOW_BYTES)
            self.links.append((url, txt))
        self.cur_url = b""
        self.cur_txt = b""

    # --- tag ops (HTML_lexer.cc:344-648) ---
    def op_body(self) -> None:
        self.get_text = True
        self.word_break()

    def op_body_c(self) -> None:
        self.get_text = False

    def op_script(self) -> None:
        self.get_text = False

    def op_script_c(self) -> None:
        if not self.get_text:
            self.get_text = True

    op_style = op_script
    op_style_c = op_script_c

    def op_title(self) -> None:
        self.get_text = True
        self.get_title = True

    def op_title_c(self) -> None:
        self.get_title = False
        self.get_text = False

    def op_a(self) -> None:
        if not self.get_text:
            return
        tokens = self.tokens
        for i, (ttype, content) in enumerate(tokens):
            nxt = tokens[i + 1] if i + 1 < len(tokens) else None
            if ttype == ATTRNAME and content.startswith(b"href") and nxt is not None and nxt[0] == LITERAL:
                self.link_add(nxt[1])
                self.inlink = True
            elif ttype == ATTRNAME and content.startswith(b"rel") and nxt is not None and nxt[0] == LITERAL:
                for tok in re.split(rb'[" ]+', nxt[1]):
                    if tok.lower() == b"nofollow":
                        self.link_nofollow = True

    def op_a_c(self) -> None:
        if self.link_nofollow:
            self.inlink = False
            self.link_nofollow = False
            return
        if self.inlink:
            self.submit_link()
            self.inlink = False

    def op_frame(self) -> None:
        if not self.get_text:
            return
        tokens = self.tokens
        for i, (ttype, content) in enumerate(tokens):
            nxt = tokens[i + 1] if i + 1 < len(tokens) else None
            if ttype == ATTRNAME and content.startswith(b"src") and nxt is not None and nxt[0] == LITERAL:
                self.link_add(nxt[1])
                self.inlink = True
        self.word_break()

    def op_frame_c(self) -> None:
        if self.inlink:
            self.submit_link()
            self.inlink = False
        self.word_break()

    def op_meta(self) -> None:
        tag = self.tag_map()
        name = tag.get(b"name")
        if name is not None and name.lower() == b"robots":
            content = tag.get(b"content")
            if content is not None:
                self.meta_name_robots(content)
        http_equiv = tag.get(b"http-equiv")
        if http_equiv is not None:
            content = tag.get(b"content")
            if http_equiv.lower() == b"content-type" and content is not None:
                m = _CHARSET_RE.search(content)
                if m:
                    self.analysis.charset = m.group(1).strip(_BOOST_TRIM)
            elif http_equiv.lower() == b"refresh" and content is not None:
                m = _META_REFRESH_RE.search(content)
                if m:
                    self.link_add(m.group(1))
                    self.submit_link()

    def meta_name_robots(self, content: bytes) -> None:
        """HTML_lexer.cc:344-385 — tokens split on ',' and ' '."""
        for tok in re.split(rb"[, ]+", content):
            if not tok:
                continue
            tok = tok.lower()
            if tok == b"index":
                self.analysis.index = True
            elif tok == b"follow":
                self.analysis.follow = True
            elif tok == b"all":
                self.analysis.follow = True
                self.analysis.index = True
                return
            elif tok == b"noindex":
                self.analysis.index = False
            elif tok == b"nofollow":
                self.analysis.follow = False
            elif tok == b"none":
                self.analysis.follow = False
                self.analysis.index = False
                return

    def op_link(self) -> None:
        """<link rel=alternate type=...> feed discovery (HTML_lexer.cc:457-507)."""
        tag = self.tag_map()
        href = tag.get(b"href")
        if href is None:
            return
        rel = tag.get(b"rel")
        type_ = tag.get(b"type")
        if rel is None or rel.lower() != b"alternate" or type_ is None:
            return
        href = href.strip(_BOOST_TRIM)
        href_cpy = href
        if self.base_url is not None:
            try:
                url = Url(href)
                url.normalize()
                if url.absolute():
                    href = url.get()
                else:
                    full = self.base_url.copy()
                    full.merge_ref(url)
                    href = full.get()
            except (BadUrl, ValueError):
                href = href_cpy
                self.warn()
        tl = type_.lower()
        if tl == b"application/rss+xml":
            self.analysis.rss2 = href
        elif tl == b"application/atom+xml":
            self.analysis.atom = href
        elif tl == b"text/xml":
            self.analysis.rss = href

    def op_link_c(self) -> None:
        pass

    def tag_map(self) -> dict[bytes, bytes]:
        """ATTRNAME followed by LITERAL → map; later wins (HTML_lexer.cc:720-728)."""
        m: dict[bytes, bytes] = {}
        tokens = self.tokens
        for i, (ttype, content) in enumerate(tokens):
            if ttype == ATTRNAME and i + 1 < len(tokens) and tokens[i + 1][0] == LITERAL:
                m[content] = tokens[i + 1][1]
        return m


def _make_tag_ops():
    stag = {}
    ctag = {}
    for t in _WORD_BREAK_TAGS:
        stag[t] = HtmlLexer.word_break
        ctag[t] = HtmlLexer.word_break
    stag[b"body"] = HtmlLexer.op_body
    ctag[b"body"] = HtmlLexer.op_body_c
    stag[b"a"] = HtmlLexer.op_a
    ctag[b"a"] = HtmlLexer.op_a_c
    stag[b"frame"] = HtmlLexer.op_frame
    ctag[b"frame"] = HtmlLexer.op_frame_c
    stag[b"iframe"] = HtmlLexer.op_frame
    ctag[b"iframe"] = HtmlLexer.op_frame_c
    stag[b"script"] = HtmlLexer.op_script
    ctag[b"script"] = HtmlLexer.op_script_c
    stag[b"style"] = HtmlLexer.op_style
    ctag[b"style"] = HtmlLexer.op_style_c
    stag[b"link"] = HtmlLexer.op_link
    ctag[b"link"] = HtmlLexer.op_link_c
    stag[b"meta"] = HtmlLexer.op_meta
    ctag[b"meta"] = HtmlLexer.word_break
    stag[b"title"] = HtmlLexer.op_title
    ctag[b"title"] = HtmlLexer.op_title_c
    return stag, ctag


_STAG_OPS, _CTAG_OPS = _make_tag_ops()
_WB_OP = HtmlLexer.word_break

# hot-path regexes for the inlined INITIAL fast paths (rules 230 and 141)
_STAGO_RE = _R(rb"<" + _NAME + _WS)
_ETAGO_RE = _R(rb"</" + _NAME + _WS)

# bind rule actions to the class methods once — the dispatch loop calls
# ``action(self, text)`` directly instead of a per-token getattr by name
_RULES = {
    cond: tuple((order, rx, getattr(HtmlLexer, name)) for (order, rx, name) in rules)
    for cond, rules in _RULES.items()
}

# INITIAL '<'-rule dispatch by second byte (prefixes partition the rules;
# longest-match within each subset, ties by rule order — lists are ordered)
def _initial_subset(orders):
    return tuple(r for r in _RULES[INITIAL] if r[0] in orders)


_INITIAL_LT = {
    b"/": _initial_subset({141, 190}),
    b"!": _initial_subset({195, 202, 207, 214, 256}),
    b"?": _initial_subset({225}),
}
_INITIAL_LT_DEFAULT = _initial_subset({230, 252})


# ---- first-byte dispatch for the generic conditions -----------------------
# For every (condition, first byte) precompute the subset of rules whose
# regex can possibly match a string starting with that byte — derived
# STATICALLY from the compiled patterns via the sre parse tree, computed
# conservatively (any construct the walker doesn't recognize widens to
# all 256 bytes). Longest-match + first-rule-order semantics inside the
# subset are identical to scanning the full rule list, because every
# excluded rule is excluded only when it provably cannot match at all.
def _first_bytes(pattern: bytes) -> frozenset[int]:
    try:
        import re._parser as sre_parse  # py3.11+
    except ImportError:  # pragma: no cover
        import sre_parse

    ALL = frozenset(range(256))

    def of_item(op, av) -> frozenset[int] | None:
        """First-byte set of one parse item; None = matches empty."""
        name = str(op)
        if name == "LITERAL":
            return frozenset((av,))
        if name == "NOT_LITERAL":
            return ALL - {av}
        if name == "IN":
            out: set[int] = set()
            negate = False
            for iop, iav in av:
                iname = str(iop)
                if iname == "NEGATE":
                    negate = True
                elif iname == "LITERAL":
                    out.add(iav)
                elif iname == "RANGE":
                    out.update(range(iav[0], iav[1] + 1))
                else:
                    return ALL  # category etc. — be conservative
            return ALL - out if negate else frozenset(out)
        if name in ("MAX_REPEAT", "MIN_REPEAT"):
            lo, _hi, sub = av
            inner = of_seq(sub)
            return inner if lo > 0 else (None if inner is None else inner | EMPTY_OK)
        if name == "SUBPATTERN":
            return of_seq(av[3])
        if name == "BRANCH":
            out = set()
            saw_empty = False
            for branch in av[1]:
                b = of_seq(branch)
                if b is None:
                    saw_empty = True
                else:
                    if EMPTY_MARK in b:
                        saw_empty = True
                        b = b - {EMPTY_MARK}
                    out.update(b)
            if saw_empty:
                return frozenset(out) | EMPTY_OK
            return frozenset(out)
        if name == "AT":  # anchors/lookarounds match empty
            return None
        if name == "ASSERT":  # lookahead: matches empty at this point
            return None
        return ALL  # unknown construct

    # sentinel marking "this element may also match empty"
    EMPTY_MARK = -1
    EMPTY_OK = frozenset((EMPTY_MARK,))

    def of_seq(seq) -> frozenset[int] | None:
        acc: set[int] = set()
        for op, av in seq:
            item = of_item(op, av)
            if item is None:
                continue  # matches empty; look further
            if EMPTY_MARK in item:
                acc.update(item - {EMPTY_MARK})
                continue  # optional element; next element also reachable
            acc.update(item)
            return frozenset(acc)
        return (frozenset(acc) | EMPTY_OK) if acc else None

    parsed = sre_parse.parse(pattern.decode("latin-1"))
    out = of_seq(parsed)
    if out is None or EMPTY_MARK in out:
        # the pattern can match the EMPTY string (e.g. the CDATA
        # trailing-context rule): a zero-length match can fire in front of
        # any byte, so no byte may exclude this rule
        return ALL
    return out


def _build_dispatch():
    tables = {}
    for cond, rules in _RULES.items():
        fb = [
            # IGNORECASE patterns: parse() here doesn't see the flag, so
            # the analysis would be unsound — widen to all bytes
            frozenset(range(256))
            if r[1].flags & re.IGNORECASE
            else _first_bytes(r[1].pattern if isinstance(r[1].pattern, bytes)
                              else r[1].pattern.encode("latin-1"))
            for r in rules
        ]
        # intern identical subsets so the 256-entry table shares tuples
        cache: dict[tuple, tuple] = {}
        row = []
        for b in range(256):
            key = tuple(i for i in range(len(rules)) if b in fb[i])
            sub = cache.get(key)
            if sub is None:
                sub = tuple(rules[i] for i in key)
                cache[key] = sub
            row.append(sub)
        tables[cond] = tuple(row)
    return tables


_DISPATCH = _build_dispatch()


def html_lex(html: bytes | str, base_url: bytes | str = b"") -> ProcHTML:
    """Parse an HTML document; returns text, links, analysis.

    Mirrors the reference's Python export ``common.html_lex``
    (HTML_lexer.cc:835-855). ``base_url`` empty → links pass through
    unresolved; non-empty → must parse as an absolute URL (else ValueError).

    Runs the C port of this scanner (clex.c, loaded via clexer.py) when it
    is available — byte parity with the Python kernel below is pinned by
    tests/test_clexer.py — and falls back to the Python kernel otherwise.
    """
    if isinstance(html, str):
        html = html.encode("utf-8")
    if isinstance(base_url, str):
        base_url = base_url.encode("utf-8")
    base: Url | None = None
    if base_url:
        base = Url(base_url)  # raises on parse error, like the C++ ctor
        if not base.absolute():
            raise ValueError(f"base_url: {base_url!r} is not absolute")
    from . import clexer

    kernel = clexer.get()
    if kernel is not None:
        out = kernel.run(html, base)
        if out is not None:
            text, title, charset, rss, rss2, atom, idx, fol, warn, links = out
            result = ProcHTML()
            result.base_url = base_url
            result.text = text
            result.links = links
            result.warnings = warn
            result.analysis = Analysis(
                title=title, rss2=rss2, rss=rss, atom=atom,
                charset=charset, index=idx, follow=fol,
            )
            return result
    return _html_lex_py(html, base_url, base)


def _html_lex_py(html: bytes, base_url: bytes, base: Url | None) -> ProcHTML:
    """The pure-Python kernel (canonical spec for the C port)."""
    lexer = HtmlLexer(html, base)
    lexer.run()
    result = ProcHTML()
    result.base_url = base_url
    result.text = b"".join(lexer.text_parts)
    result.links = lexer.links
    result.warnings = lexer.warnings
    result.analysis = lexer.analysis
    return result


def html_lex_py(html: bytes | str, base_url: bytes | str = b"") -> ProcHTML:
    """Force the pure-Python kernel (differential-test entry point)."""
    if isinstance(html, str):
        html = html.encode("utf-8")
    if isinstance(base_url, str):
        base_url = base_url.encode("utf-8")
    base: Url | None = None
    if base_url:
        base = Url(base_url)
        if not base.absolute():
            raise ValueError(f"base_url: {base_url!r} is not absolute")
    return _html_lex_py(html, base_url, base)
