"""mycelium_spark — a PySpark-native web-crawl analytics engine.

From-scratch reimplementation of the capabilities of the reference crawl
engine (larroy/mycelium) on Apache Spark: URL frontier + politeness
scheduler over columnar page tables, exact-parity extraction kernels
(URL normalize, robots.txt, HTML text/link extraction) as vectorized
pandas/Arrow UDFs, plus large-scale training-data operators
(dedup, similarity search, text quality, inverted index).
"""

from .functions.url import (  # noqa: F401
    BadUrl,
    Path,
    Url,
    UrlParseError,
    escape,
    escape_reserved_unsafe,
    normalize_url,
    unescape,
    unescape_all,
    unescape_not,
    unescape_safe,
    valid_host,
)

__version__ = "0.1.0"
