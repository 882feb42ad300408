"""RFC 3986 URL parse / escape / normalize / merge — exact-parity kernel.

From-scratch Python reimplementation of the reference engine's URL semantics
(behavioral spec: /root/reference/src/common/Url.cc, Url.hh, Path.cc, Path.hh).
Every deviation of the reference from the RFC is reproduced deliberately,
because the normalized URL string is the join key of the whole crawl engine
and the per-row parity invariant requires identical output:

* query keeps its leading ``?`` and fragment its ``#`` (Url.cc:621-645);
* setting a scheme marks the URL as having an authority (Url.cc:391);
* ``//`` with empty authority is only legal for ``file:`` (Url.cc:79-88);
* percent-escaping preserves already-valid ``%XX`` triplets (Url.cc:686-703)
  and emits uppercase hex (utils.hh:311-316);
* ``unescape_safe`` only decodes octets that are neither reserved nor unsafe
  per the 256-entry table (Url.cc:791-813, Url.hh:167-195);
* dot-segment removal never touches the first segment, so a leading ``./`` or
  ``../`` survives (Path.cc:43-74; pinned by Url_test.cc:159-164);
* ``merge_ref`` keeps the base query when the ref has an authority but no
  query (Url.cc:221-228), clears it in the path-merge branch (Url.cc:234-238).

All processing is byte-level (the reference works on ``std::string`` bytes);
non-ASCII input is escaped byte-by-byte, so serialized URLs are pure ASCII.
"""

from __future__ import annotations

import re

from .chartables import (
    URL_CHAR_AUTH,
    URL_CHAR_FRAGMENT,
    URL_CHAR_PATH,
    URL_CHAR_QUERY,
    URL_CHAR_RESERVED,
    URL_CHAR_TABLE,
    URL_CHAR_UNSAFE,
)


class BadUrl(ValueError):
    """Url is structurally unusable (Url.hh:296-300)."""


class UrlParseError(BadUrl):
    """Url failed to parse (Url.hh:305-311)."""


_HEXDIGITS = frozenset(b"0123456789abcdefABCDEF")
_HEX_UPPER = b"0123456789ABCDEF"

# Url.hh:117-132 — primary split + component validation regexes (bytes-level,
# ASCII classes like boost under the C locale).
_RE_URL = re.compile(rb"(([^:/?#]+):)?(//([^/?#]*)|///)?([^?#]*)(\?[^#]*)?(#.*)?")
_RE_SCHEME = re.compile(rb"[A-Za-z][A-Za-z0-9+.\-]*")
_RE_HOST = re.compile(rb"[A-Za-z0-9]([A-Za-z0-9.\-]*[A-Za-z0-9.])?")
_RE_PORT = re.compile(rb"\d{1,5}")
# Reference regex is `^v[[:xdigit:]]\.1[...]*$` — single hex digit and a
# literal "1" after the dot (Url.hh:127); reproduced as-is.
_RE_IPVFUT = re.compile(rb"v[0-9A-Fa-f]\.1[A-Za-z0-9._~!$&'()*+,;=:\-]*")

# Url.hh:89-102 — including the `[0-0]` typo in the 200-249 decoct branch.
_DECOCT = rb"([01]?[0-9]?[0-9]|2[0-4][0-0]|25[0-5])"
_IPV4 = rb"(" + _DECOCT + rb"\." + _DECOCT + rb"\." + _DECOCT + rb"\." + _DECOCT + rb")"
_H16 = rb"([0-9A-Fa-f]{1,4})"
_LS32 = rb"(([0-9A-Fa-f]{1,4}:[0-9A-Fa-f]{1,4})|" + _IPV4 + rb")"
_RE_IPV6 = re.compile(
    rb"("
    + rb"((" + _H16 + rb":){6}" + _LS32 + rb")"
    + rb"|(::(" + _H16 + rb":){5}" + _LS32 + rb")"
    + rb"|((" + _H16 + rb")?::(" + _H16 + rb":){4}" + _LS32 + rb")"
    + rb"|(((" + _H16 + rb":){0,1}" + _H16 + rb")?::(" + _H16 + rb":){3}" + _LS32 + rb")"
    + rb"|(((" + _H16 + rb":){0,2}" + _H16 + rb")?::(" + _H16 + rb":){2}" + _LS32 + rb")"
    + rb"|(((" + _H16 + rb":){0,3}" + _H16 + rb")?::(" + _H16 + rb":){1}" + _LS32 + rb")"
    + rb"|(((" + _H16 + rb":){0,4}" + _H16 + rb")?::" + _LS32 + rb")"
    + rb"|(((" + _H16 + rb":){0,5}" + _H16 + rb")?::" + _H16 + rb")"
    + rb"|(((" + _H16 + rb":){0,6}" + _H16 + rb")?::)"
    + rb")"
)
_RE_IPV4_FULL = re.compile(_IPV4)


def _as_bytes(s: str | bytes) -> bytes:
    if isinstance(s, bytes):
        return s
    return s.encode("utf-8")


_SAFE_DELETE_TABLES: dict[int, bytes] = {}


def _escaping_bytes_present(b: bytes, mask: int) -> bool:
    table = _SAFE_DELETE_TABLES.get(mask)
    if table is None:
        table = bytes(c for c in range(256) if not (URL_CHAR_TABLE[c] & mask))
        _SAFE_DELETE_TABLES[mask] = table
    # deleting all non-escaping bytes leaves only the ones needing work
    return bool(b.translate(None, table))


def escape(s: str | bytes, mask: int) -> bytes:
    """Percent-escape bytes whose table entry matches ``mask`` (Url.cc:678-719).

    A ``%`` followed by two hex digits is treated as an existing escape and
    copied verbatim.
    """
    b = _as_bytes(s)
    if not b:
        return b
    if not _escaping_bytes_present(b, mask):  # C-speed fast path
        return b
    out = bytearray()
    i = 0
    n = len(b)
    while i < n:
        c = b[i]
        if URL_CHAR_TABLE[c] & mask:
            if c == 0x25 and i + 2 < n and b[i + 1] in _HEXDIGITS and b[i + 2] in _HEXDIGITS:
                out += b[i : i + 3]
                i += 3
                continue
            out += b"%"
            out.append(_HEX_UPPER[c >> 4])
            out.append(_HEX_UPPER[c & 0xF])
        else:
            out.append(c)
        i += 1
    return bytes(out)


def _unescape_pred(s: str | bytes, pred) -> bytes:
    b = _as_bytes(s)
    if not b or b"%" not in b:
        return b
    out = bytearray()
    i = 0
    n = len(b)
    while i < n:
        c = b[i]
        if c == 0x25 and i + 2 < n and b[i + 1] in _HEXDIGITS and b[i + 2] in _HEXDIGITS:
            dec = int(b[i + 1 : i + 3], 16)
            if pred(dec):
                out.append(dec)
                i += 3
                continue
        out.append(c)
        i += 1
    return bytes(out)


def unescape_all(s: str | bytes) -> bytes:
    """Decode every ``%XX`` (Url.cc:721-741)."""
    return _unescape_pred(s, lambda c: True)


def unescape(s: str | bytes, mask: int) -> bytes:
    """Decode ``%XX`` whose decoded byte matches ``mask`` (Url.cc:743-765)."""
    return _unescape_pred(s, lambda c: URL_CHAR_TABLE[c] & mask)


def unescape_not(s: str | bytes, mask: int) -> bytes:
    """Decode ``%XX`` whose decoded byte does NOT match ``mask`` (Url.cc:767-789)."""
    return _unescape_pred(s, lambda c: (URL_CHAR_TABLE[c] & mask) == 0)


def unescape_safe(s: str | bytes) -> bytes:
    """Decode only octets that are neither reserved nor unsafe (Url.cc:791-813)."""
    return _unescape_pred(
        s, lambda c: (URL_CHAR_TABLE[c] & (URL_CHAR_RESERVED | URL_CHAR_UNSAFE)) == 0
    )


def escape_reserved_unsafe(s: str | bytes) -> bytes:
    """Url.cc:673-676."""
    return escape(s, URL_CHAR_RESERVED | URL_CHAR_UNSAFE)


def normalize_escapes_str(s: str | bytes) -> bytes:
    """``unescape_safe`` then uppercase remaining ``%xx`` hex (Url.cc:346-357)."""
    res = bytearray(unescape_safe(s))
    i = 0
    n = len(res)
    while i < n:
        if res[i] == 0x25 and i + 2 < n and res[i + 1] in _HEXDIGITS and res[i + 2] in _HEXDIGITS:
            seg = res[i + 1 : i + 3].upper()
            res[i + 1] = seg[0]
            res[i + 2] = seg[1]
            i += 2
        i += 1
    return bytes(res)


class Path:
    """Segment-list path with begin/end slash flags (Path.hh:35-125)."""

    __slots__ = ("segmt", "slash_begin", "slash_end")

    def __init__(self, s: bytes | str | None = None):
        self.segmt: list[bytes] = []
        self.slash_begin = False
        self.slash_end = False
        if s is not None:
            self.assign(_as_bytes(s))

    def clear(self) -> None:
        self.segmt = []
        self.slash_begin = False
        self.slash_end = False

    def empty(self) -> bool:
        return not self.slash_end and not self.segmt and not self.slash_begin

    def absolute(self) -> bool:
        return self.slash_begin

    def set_absolute(self, a: bool) -> None:
        self.slash_begin = a

    def copy_from(self, other: "Path") -> None:
        self.segmt = list(other.segmt)
        self.slash_begin = other.slash_begin
        self.slash_end = other.slash_end

    def assign(self, s: bytes) -> None:
        """Split on '/', collapsing empty segments (Path.cc:133-177)."""
        self.clear()
        if not s:
            return
        if s[0] == 0x2F:
            self.slash_begin = True
        self.segmt = [seg for seg in s.split(b"/") if seg]
        if s[-1] == 0x2F:
            self.slash_end = True

    def merge(self, p: "Path") -> None:
        """Relative-path merge (Path.cc:13-41)."""
        if p.slash_begin:
            self.copy_from(p)
            return
        if not self.slash_end and self.segmt and not p.empty():
            self.segmt.pop()  # drop the file element
        for seg in p.segmt:
            if seg == b".":
                self.slash_end = True
            elif seg == b"..":
                if self.segmt:
                    self.segmt.pop()
                    self.slash_end = True
            else:
                self.segmt.append(seg)
                self.slash_end = False
        if p.slash_end:
            self.slash_end = True

    def normalize(self) -> None:
        """Dot-segment removal, starting from the SECOND segment (Path.cc:43-74).

        The first segment is never inspected, so leading ``.``/``..`` of
        relative paths survive (Url_test.cc:159-164).
        """
        seg = self.segmt
        i = 1
        while i < len(seg):
            # C++ guard `j != i` only fails when i is back at begin after a
            # double-erase; there the ".." collapse is skipped but "." still
            # erases (Path.cc:52-61).
            if i > 0 and seg[i] == b".." and seg[i - 1] not in (b"..", b"."):
                del seg[i]
                del seg[i - 1]
                i -= 1
                if i == len(seg):
                    self.slash_end = True
            elif seg[i] == b".":
                del seg[i]
                if i == len(seg):
                    self.slash_end = True
            else:
                i += 1

    def get(self) -> bytes:
        """Serialize (Path.cc:101-131)."""
        if self.empty():
            return b""
        if self.segmt:
            result = b"/" if self.slash_begin else b""
            result += b"/".join(self.segmt)
            if self.slash_end:
                result += b"/"
            if result == b"//":  # Path.cc:123 safety
                result = b"/"
            return result
        return b"/"

    def size(self) -> int:
        """Path.cc:76-99."""
        if self.empty():
            return 0
        if self.segmt:
            size = 1 if self.slash_begin else 0
            size += sum(len(s) for s in self.segmt)
            if self.slash_end:
                size += 1
            size += len(self.segmt) - 1
            return size
        return 1

    def depth(self) -> int:
        return len(self.segmt)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Path({self.get()!r})"


class Url:
    """Structured URL with reference-exact parse/normalize/merge semantics."""

    __slots__ = (
        "_path",
        "m_scheme",
        "m_has_authority",
        "m_host_ip_literal",
        "m_userinfo",
        "m_host",
        "m_port",
        "m_query",
        "m_fragment",
    )

    def __init__(self, s: str | bytes | None = None):
        self.clear()
        if s is not None:
            self.assign(_as_bytes(s))

    def clear(self) -> None:
        self._path = Path()
        self.m_scheme = b""
        self.m_has_authority = False
        self.m_host_ip_literal = False
        self.m_userinfo = b""
        self.m_host = b""
        self.m_port = b""
        self.m_query = b""
        self.m_fragment = b""

    # --- parse (Url.cc:51-117) ---
    def assign(self, s: str | bytes) -> None:
        b = _as_bytes(s)
        self.clear()
        m = _RE_URL.fullmatch(b)
        if m is None:
            raise UrlParseError("Url doesn't match primary url regex")
        # group indexes mirror the C++ enum: 2=SCHEME, 3=DSLASH_AUTH,
        # 4=AUTHORITY, 5=PATH, 6=QUERY, 7=FRAGMENT
        if m.group(2) is not None:
            self.set_scheme(m.group(2))
        if m.group(3) is not None and m.group(3) == b"//":
            # '//' with empty authority only legal for file: (Url.cc:79-88)
            if self.m_scheme and self.m_scheme != b"file":
                raise UrlParseError(
                    "empty authority part, with // is not allowed for schemes other than 'file'"
                )
        if m.group(4) is not None:
            self.set_authority(m.group(4))
        if m.group(5) is not None:
            self.set_path(m.group(5))
        if m.group(6) is not None:
            self.set_query(m.group(6))
        if m.group(7) is not None:
            self.set_fragment(m.group(7))
        if not self.syntax_ok():
            raise UrlParseError("! syntax_ok() for this url, sanity checks failed")
        if not self._valid_host_self():
            raise UrlParseError("! valid_host() for this url, sanity checks failed")

    # --- validation (Url.cc:119-193) ---
    def syntax_ok(self) -> bool:
        if self.has_authority():
            if not (self._path.empty() or self._path.absolute()):
                return False
        if any(c in self.m_scheme for c in (b":", b"/", b"?", b"#")):
            return False
        if any(c in self.m_host for c in (b"/", b"?", b"#")):
            return False
        if not self._valid_host_self():
            return False
        path = self._path.get()
        if b"?" in path or b"#" in path:
            return False
        if b"#" in self.m_query:
            return False
        return True

    def _valid_host_self(self) -> bool:
        return valid_host(self.m_host)

    # --- merge (Url.cc:195-264) ---
    def merge_ref(self, u: "Url") -> "Url":
        if not u.syntax_ok():
            raise BadUrl("supplied url ! syntax_ok")
        if self.absolute() and not u.absolute():
            if u.has_authority():
                self.set_authority(u.authority())
                self.set_path(u.path())
                if u.has_query():
                    self.set_query(u.query())
                # NOTE: base query RETAINED when ref has authority but no
                # query (Url.cc:221-228) — reference quirk.
            else:
                if u._path.empty():
                    if u.has_query():
                        self.set_query(u.query())
                else:
                    self._path.merge(u._path)
                    if u.has_query():
                        self.set_query(u.query())
                    else:
                        self.clear_query()
                if u.has_fragment():
                    self.set_fragment(u.fragment())
                else:
                    self.clear_fragment()
            if u.has_fragment():
                self.set_fragment(u.fragment())
            else:
                self.clear_fragment()
        elif not self.absolute() and u.absolute():
            raise BadUrl("Can only merge an absolute url with a reference")
        elif self.absolute() and u.absolute():
            raise BadUrl("Can't merge two absolute urls")
        else:
            raise BadUrl("Can't merge two relative references")
        return self

    # --- equality (Url.cc:281-302) ---
    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Url):
            return NotImplemented
        lhs = self.copy()
        rhs = other.copy()
        lhs.normalize()
        rhs.normalize()
        return lhs.get() == rhs.get()

    def __ne__(self, other: object) -> bool:
        eq = self.__eq__(other)
        if eq is NotImplemented:
            return eq
        return not eq

    __hash__ = None  # mutable

    def copy(self) -> "Url":
        u = Url()
        u.m_scheme = self.m_scheme
        u.m_has_authority = self.m_has_authority
        u.m_host_ip_literal = self.m_host_ip_literal
        u.m_userinfo = self.m_userinfo
        u.m_host = self.m_host
        u.m_port = self.m_port
        u.m_query = self.m_query
        u.m_fragment = self.m_fragment
        u._path.copy_from(self._path)
        return u

    # --- normalization (Url.cc:330-379) ---
    def normalize_scheme(self) -> None:
        self.m_scheme = bytes(
            c + 0x20 if 0x41 <= c <= 0x5A else c for c in self.m_scheme
        )

    def normalize_host(self) -> None:
        # ASCII-only lowercase per RFC 4343 (Url.cc:335-344)
        self.m_host = bytes(
            c + 0x20 if 0x41 <= c <= 0x5A else c for c in self.m_host
        )

    def normalize_escapes(self) -> None:
        s = normalize_escapes_str(self.get())
        try:
            self.assign(s)
        except UrlParseError as e:
            raise BadUrl(f"normalize_escapes: {e}") from e

    def normalize(self) -> "Url":
        self.normalize_scheme()
        self.normalize_host()
        # Fast path: normalize_escapes serializes and reparses (Url.cc:359-370)
        # purely to apply unescape_safe + hex uppercasing; with no '%' in the
        # serialized form that round-trip is a state no-op — except for two
        # cases kept on the slow path: empty-host authorities (the reparse
        # can throw or change the serialization, e.g. "a:x" → "a:///x") and
        # the slash_end flag a bare "/" path acquires (replicated directly).
        # Equivalence fuzz-verified over 400k random URLs (tests/test_url.py).
        s = self.get()
        if b"%" not in s and (self.m_host or not self.m_has_authority):
            if self.m_has_authority and not self._path.segmt and self._path.slash_begin:
                self._path.slash_end = True
            self._path.normalize()
            return self
        self.normalize_escapes()
        self._path.normalize()
        return self

    # --- accessors ---
    def set_scheme(self, s: str | bytes) -> None:
        b = _as_bytes(s)
        if _RE_SCHEME.fullmatch(b) is None:
            raise UrlParseError(f"scheme: {b!r} doesn't match scheme validation regex")
        self.m_scheme = b.lower()
        # Quirk: setting a scheme marks authority present (Url.cc:391).
        self.m_has_authority = True

    def scheme(self) -> bytes:
        return self.m_scheme

    def has_scheme(self) -> bool:
        return bool(self.m_scheme)

    def set_authority(self, s: str | bytes) -> None:
        """[userinfo@]host[:port], incl. [v6] literals (Url.cc:406-452)."""
        b = _as_bytes(s)
        host_b = 0
        at = b.find(b"@")
        if at != -1:
            self.set_userinfo(b[:at])
            host_b = at + 1
            if host_b >= len(b):
                raise UrlParseError(f"authority doesn't have host part: {b!r}")
        if b[host_b : host_b + 1] == b"[":
            self.m_host_ip_literal = True
            host_b += 1
            if host_b >= len(b):
                raise UrlParseError("authority incomplete host part, nothing follows '['")
            host_e = b.find(b"]", host_b)
            if host_e == -1:
                raise UrlParseError("authority incomplete host part, couldn't find closing ']'")
            self.set_host(b[host_b:host_e])
        else:
            host_e = b.find(b":", host_b)
            if host_e == -1:
                self.set_host(b[host_b:])
            else:
                if host_e == host_b:
                    raise UrlParseError("authority starts with : without @ part")
                self.set_host(b[host_b:host_e])
                port_b = host_e + 1
                if port_b < len(b):
                    self.set_port(b[port_b:])
                else:
                    raise UrlParseError("no port number after :")

    def authority(self) -> bytes:
        if not self.m_host:
            return b""
        result = b""
        if self.m_userinfo:
            result += self.m_userinfo + b"@"
        if self.m_host_ip_literal:
            result += b"[" + self.m_host + b"]"
        else:
            result += self.m_host
        if self.m_port:
            result += b":" + self.m_port
        return result

    def has_authority(self) -> bool:
        return self.m_has_authority

    def clear_authority(self) -> None:
        self.m_host_ip_literal = False
        self.m_has_authority = False
        self.m_userinfo = b""
        self.m_host = b""
        self.m_port = b""

    def set_userinfo(self, s: str | bytes) -> None:
        self.m_userinfo = escape(s, URL_CHAR_AUTH)

    def userinfo(self) -> bytes:
        return self.m_userinfo

    def set_host(self, s: str | bytes) -> None:
        norm = escape(s, URL_CHAR_AUTH)
        if valid_host(norm):
            self.m_host = norm
            self.m_has_authority = True
        else:
            raise UrlParseError(f"Url::host({s!r}): Invalid host")

    def host(self) -> bytes:
        return self.m_host

    def set_port(self, s: str | bytes) -> None:
        b = _as_bytes(s)
        if not b:
            self.m_port = b""
            return
        if _RE_PORT.fullmatch(b) is None:
            raise UrlParseError(f"Url::port({b!r}): Invalid port: regex didn't match")
        port = int(b)
        if not (0 < port < (1 << 16)):
            raise UrlParseError(f"Url::port({b!r}): out of range (0,2^16)")
        self.m_port = b

    def port(self) -> bytes:
        return self.m_port

    def port_int(self) -> int:
        if not self.m_port:
            raise BadUrl("port is empty")
        return int(self.m_port)

    def set_path(self, s: str | bytes) -> None:
        self._path.assign(escape(s, URL_CHAR_PATH))
        if self.has_authority():
            self._path.set_absolute(True)

    def path(self) -> bytes:
        return self._path.get()

    def normalize_path(self) -> None:
        self._path.normalize()

    def set_query(self, s: str | bytes) -> None:
        self.m_query = escape(s, URL_CHAR_QUERY)

    def query(self) -> bytes:
        return self.m_query

    def has_query(self) -> bool:
        return bool(self.m_query)

    def clear_query(self) -> None:
        self.m_query = b""

    def set_fragment(self, s: str | bytes) -> None:
        self.m_fragment = escape(s, URL_CHAR_FRAGMENT)

    def fragment(self) -> bytes:
        return self.m_fragment

    def has_fragment(self) -> bool:
        return bool(self.m_fragment)

    def clear_fragment(self) -> None:
        self.m_fragment = b""

    def empty(self) -> bool:
        return not (
            self.m_scheme
            or self.m_has_authority
            or not self._path.empty()
            or self.has_query()
            or self.has_fragment()
        )

    def absolute(self) -> bool:
        return bool(self.m_scheme)

    # --- serialize (Url.cc:621-670) ---
    def get(self) -> bytes:
        res = b""
        if self.m_scheme:
            res += self.m_scheme + b":"
        if self.has_authority():
            res += b"//" + self.authority()
        res += self._path.get()
        res += self.m_query
        res += self.m_fragment
        return res

    def size(self) -> int:
        res = 0
        if self.m_scheme:
            res += len(self.m_scheme) + 1
        if self.has_authority():
            res += 2 + len(self.authority())
        res += self._path.size()
        res += len(self.m_query)
        res += len(self.m_fragment)
        return res

    def to_string(self) -> str:
        return self.get().decode("latin-1")

    def __str__(self) -> str:
        return self.to_string()

    def __repr__(self) -> str:  # pragma: no cover
        return f"Url({self.to_string()!r})"


# --- canonical-form fast screen -------------------------------------------
# A URL matching this pattern is guaranteed normalize()-invariant AND
# absolute (scheme present): lowercase http/https scheme, lowercase
# reg-name host (alnum start/end), optional port; non-empty absolute path
# of segments made of bytes that escape(PATH) leaves alone, with no '%',
# no empty segments; optional query/fragment of pass-through bytes
# without '%'. A separate dot-segment screen excludes '.'/'..' segments.
# Shared by udfs.normalize_url_series (string form) and the lexer's link
# resolution (bytes form) so the two fast paths cannot drift apart.
_FAST_SEG = r"[A-Za-z0-9!$&'()*+,.\-:;=@_~]+"
FAST_NORMALIZED_RE_STR = (
    r"https?://[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?(?::[1-9][0-9]{0,3})?"
    r"(?:/(?:" + _FAST_SEG + r"/)*(?:" + _FAST_SEG + r")?)"
    r"(?:\?[A-Za-z0-9!$&'()*+,.\-/:;=?@_~]*)?"
    r"(?:#[A-Za-z0-9!$&'()*+,.\-/:;=?@#_~]*)?"
)
FAST_DOTSEG_RE_STR = r"/\.{1,2}(?:/|$|\?|#)"
NORMALIZED_ABS_RE = re.compile(FAST_NORMALIZED_RE_STR.encode("ascii"))
DOTSEG_RE = re.compile(FAST_DOTSEG_RE_STR.encode("ascii"))


def valid_host(h: str | bytes) -> bool:
    """Url.cc:169-193."""
    b = _as_bytes(h)
    if not b:
        return True
    host = unescape_safe(b)
    return (
        _RE_HOST.fullmatch(host) is not None
        or _RE_IPVFUT.fullmatch(host) is not None
        or _RE_IPV6.fullmatch(host) is not None
        or _RE_IPV4_FULL.fullmatch(host) is not None
    )


def normalize_url(s: str | bytes) -> str:
    """Parse + full normalize, returning the canonical string (raises BadUrl)."""
    u = Url(s)
    u.normalize()
    return u.to_string()


def url_host(s: str | bytes) -> str:
    return Url(s).host().decode("latin-1")
