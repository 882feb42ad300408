"""URL character classification table.

Reimplements the 256-entry classification table of the reference engine
(/root/reference/src/common/Url.hh:143-206) used by escape/unescape and the
robots-path canonicalizer. Bit meanings follow Url.hh:143-151.

The table is exposed both as a Python list (for the scalar kernel) and as a
numpy uint8 array (for vectorized batch kernels).
"""

from __future__ import annotations

URL_CHAR_RESERVED = 0x1
URL_CHAR_UNSAFE = 0x2
URL_CHAR_ESC = 0x4
URL_CHAR_AUTH = 0x8
URL_CHAR_PATH = 0x10
URL_CHAR_QUERY = 0x20
URL_CHAR_FRAGMENT = 0x40

_R = URL_CHAR_RESERVED
_U = URL_CHAR_UNSAFE
_E = URL_CHAR_ESC
_A = URL_CHAR_AUTH
_P = URL_CHAR_PATH
_Q = URL_CHAR_QUERY
_F = URL_CHAR_FRAGMENT
_RU = _R | _U
_X = _U | _E | _A | _P | _Q | _F

# Url.hh:167-195 — one entry per byte 0x00-0xFF.
URL_CHAR_TABLE: list[int] = [
    # 0x00-0x1F: control chars
    *([_X] * 32),
    # SP  !  "   #              $   %   &   '
    _X, 0, _X, _RU | _A | _P | _Q, _R, _X, _R, 0,
    # (  )  *  +   ,   -  .  /
    0, 0, 0, _R, _R, 0, 0, _R | _A,
    # 0-7
    0, 0, 0, 0, 0, 0, 0, 0,
    # 8  9  :    ;   <   =   >   ?
    0, 0, _RU, _R, _X, _R, _X, _R | _A | _P,
    # @
    _RU, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0,
    # X  Y  Z  [    \   ]    ^   _
    0, 0, 0, _RU, _X, _RU, _X, 0,
    # `
    _X, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0,
    # x  y  z  {   |   }   ~  DEL
    0, 0, 0, _X, _X, _X, 0, _X,
    # 0x80-0xFF
    *([_X] * 128),
]

assert len(URL_CHAR_TABLE) == 256


def __getattr__(name: str):
    # numpy costs ~0.1 s of cold import; every fresh python worker and
    # multiprocessing pool process pays it, so build the vectorized table
    # only when a batch kernel first asks for it.
    if name == "URL_CHAR_TABLE_NP":
        import numpy as np

        table = np.asarray(URL_CHAR_TABLE, dtype=np.uint8)
        globals()[name] = table
        return table
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


_HEX_UPPER = b"0123456789ABCDEF"


def url_char_test(byte: int, mask: int) -> int:
    return URL_CHAR_TABLE[byte] & mask
