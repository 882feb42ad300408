"""Bencode encoder/decoder (S12).

The reference carries a torrent-style bencode codec
(/root/reference/src/common/bencode.{hh,cc}) that the live crawl path never
uses; provided for surface completeness. Types: int → ``i<n>e``, bytes →
``<len>:<bytes>``, list → ``l...e``, dict → ``d...e`` with byte-string keys
sorted lexicographically (BEP-3).
"""

from __future__ import annotations


def bencode(obj) -> bytes:
    if isinstance(obj, bool):
        raise TypeError("bencode has no boolean type")
    if isinstance(obj, int):
        return b"i%de" % obj
    if isinstance(obj, str):
        obj = obj.encode("utf-8")
    if isinstance(obj, (bytes, bytearray)):
        return b"%d:%s" % (len(obj), bytes(obj))
    if isinstance(obj, (list, tuple)):
        return b"l" + b"".join(bencode(x) for x in obj) + b"e"
    if isinstance(obj, dict):
        items = []
        for k in sorted(k.encode("utf-8") if isinstance(k, str) else bytes(k) for k in obj):
            v = obj.get(k) if k in obj else obj[k.decode("utf-8")]
            items.append(bencode(k) + bencode(v))
        return b"d" + b"".join(items) + b"e"
    raise TypeError(f"cannot bencode {type(obj)!r}")


def bdecode(b: bytes):
    """Decode one bencoded value; raises ValueError on malformed input."""
    value, rest = _bdecode(b, 0)
    if rest != len(b):
        raise ValueError(f"trailing bytes after bencoded value at {rest}")
    return value


def _bdecode(b: bytes, i: int):
    if i >= len(b):
        raise ValueError("truncated bencode")
    c = b[i : i + 1]
    if c == b"i":
        end = b.index(b"e", i)
        num = b[i + 1 : end]
        if num in (b"", b"-") or (num.startswith(b"0") and num != b"0") or num.startswith(b"-0"):
            raise ValueError(f"invalid integer {num!r}")
        return int(num), end + 1
    if c == b"l":
        out = []
        i += 1
        while b[i : i + 1] != b"e":
            v, i = _bdecode(b, i)
            out.append(v)
        return out, i + 1
    if c == b"d":
        out = {}
        i += 1
        prev_key = None
        while b[i : i + 1] != b"e":
            k, i = _bdecode(b, i)
            if not isinstance(k, bytes):
                raise ValueError("dict key must be a byte string")
            if prev_key is not None and k <= prev_key:
                raise ValueError("dict keys out of order")
            prev_key = k
            v, i = _bdecode(b, i)
            out[k] = v
        return out, i + 1
    if c.isdigit():
        colon = b.index(b":", i)
        n = int(b[i:colon])
        if b[i:i+1] == b"0" and colon != i + 1:
            raise ValueError("invalid length prefix")
        start = colon + 1
        if start + n > len(b):
            raise ValueError("truncated string")
        return b[start : start + n], start + n
    raise ValueError(f"unexpected byte {c!r} at {i}")
