"""HTTP header parsing + content-type classification — exact-parity kernel.

Behavioral spec: /root/reference/src/common/utils.cc:612-731 (live branch)
and crawler.cc:1206-1209 (acceptability). Quirks reproduced:

* the xhtml branch omits ``!= npos`` (utils.cc:699): any Content-Type value
  that is not text/html, not text/plain and does NOT START with
  ``application/xhtml+xml`` classifies as XHTML; a value that does start
  with it falls through to the pdf/rss/atom checks and usually lands on
  UNRECOGNIZED;
* lines shorter than 2 chars are skipped and a final line without a
  trailing newline is never processed (tortoise/hare loop, utils.cc:683-686);
* the charset token may contain spaces (the token class excludes
  separators+CTLs but not SP) and is NOT trimmed here (utils.cc:628,725-727).
"""

from __future__ import annotations

import re

# content-type enum — names reconstructed from usage (content_type.hh is
# absent from the reference tree; members per utils.cc:693-714 and
# crawler.cc:1206-1209: acceptable iff UNRECOGNIZED < type < EMPTY).
CT_UNSET = "UNSET"
CT_UNRECOGNIZED = "UNRECOGNIZED"
CT_TEXT_HTML = "text/html"
CT_TEXT_PLAIN = "text/plain"
CT_XHTML = "application/xhtml+xml"
CT_APPLICATION_PDF = "application/pdf"
CT_RSS_XML = "application/rss+xml"
CT_ATOM_XML = "application/atom+xml"
CT_EMPTY = "EMPTY"

ACCEPTABLE_TYPES = frozenset(
    (CT_TEXT_HTML, CT_TEXT_PLAIN, CT_XHTML, CT_APPLICATION_PDF, CT_RSS_XML, CT_ATOM_XML)
)

# HEADER_RE: ([^separators]+):(.+)  (utils.cc:617)
_SEPARATORS = r"()<>@,;\\:\"/\[\]?={}\t"
_HEADER_RE = re.compile(r"([^" + _SEPARATORS + r"]+):(.+)")
# token excludes CTLs and separators but NOT the space (utils.cc:613-614)
_CHARSET_RE = re.compile(r"charset=([^\x00-\x1f\x7f()<>@,;:\\\"/\[\]?={}\t]+)")
_CONTENT_TYPE_NAME_RE = re.compile(r"^Content-Type$", re.I)


def classify_content_type(value: str) -> str:
    """utils.cc:693-714 with the xhtml-fallthrough quirk."""
    if "text/html" in value:
        return CT_TEXT_HTML
    if "text/plain" in value:
        return CT_TEXT_PLAIN
    if value.find("application/xhtml+xml") != 0:  # quirky truthiness of find()
        return CT_XHTML
    if "application/pdf" in value:
        return CT_APPLICATION_PDF
    if "application/rss+xml" in value:
        return CT_RSS_XML
    if "application/atom+xml" in value:
        return CT_ATOM_XML
    return CT_UNRECOGNIZED


def parse_http_headers(headers: str) -> tuple[str, str, dict[str, str]]:
    """Returns (content_type, charset, header_map).

    content_type is CT_UNSET when no Content-Type header was seen
    (the crawler initializes the out-param to the enum default).
    """
    content_type = CT_UNSET
    charset = ""
    headermap: dict[str, str] = {}
    tortoise = 0
    n = len(headers)
    while True:
        hare = tortoise
        while hare < n and headers[hare] not in "\n\r":
            hare += 1
        if hare >= n:
            break  # final unterminated line never processed (utils.cc:683)
        if hare > tortoise + 1:
            line = headers[tortoise:hare]
            m = _HEADER_RE.fullmatch(line)
            if m:
                name, value = m.group(1), m.group(2)
                if _CONTENT_TYPE_NAME_RE.fullmatch(name):
                    content_type = classify_content_type(value)
                    cm = _CHARSET_RE.search(value)
                    if cm:
                        charset = cm.group(1)
                headermap[name] = value
        tortoise = hare + 1
    return content_type, charset, headermap


def acceptable(content_type: str) -> bool:
    """crawler.cc:1206-1209: UNRECOGNIZED < ctype < EMPTY."""
    return content_type in ACCEPTABLE_TYPES
