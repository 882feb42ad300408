"""Compression-ratio quality signal (the Dolma / RedPajama "gzip
ratio" heuristic).

How well a document deflates is a cheap, language-agnostic proxy for
two failure modes the token-level filters can miss: near-zero ratios
mean machine-generated repetition (keyword stuffing, template spam —
even when no single n-gram rule fires), and ratios near or above 1
mean the "text" is not natural language at all (minified blobs,
base64, binary mis-decodes) or is too short to judge. Dolma
(Soldaini et al. 2024) and RedPajama-v2 both ship this as a standard
quality signal alongside the Gopher rules.

Numbers kept exact: the only Python is the zlib kernel itself (there
is no JVM-side deflate expression in Spark SQL) — an Arrow-batched
pandas UDF returning ONE long per row (the compressed byte count).
Byte lengths, the millipoint ratio (integer `div`) and the keep gate
are JVM expressions, so the driver-hash comparison never touches a
float and the oracle is an independent single-process zlib
recomputation over the same parquet.

Scale shape: per-row only — no shuffle, no join; the UDF ships text
once through Arrow and returns 8 bytes/row. Compose it into the
clean_corpus gate where the other per-row rules already scan.
DEFLATE at level 6 runs ~40-100 MB/s/core, far above the fetch
pipeline's per-core page throughput, so the stage is scan-bound, not
CPU-bound, at cluster scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LEVEL_DEFAULT = 6  # zlib default; fixed so oracle and engine agree
MIN_RATIO_MILLI_DEFAULT = 250  # below: repetition/template spam
MAX_RATIO_MILLI_DEFAULT = 900  # above: not natural text (or too short)
EMPTY_SENTINEL = 1_000_001  # raw_len = 0: no ratio exists; always drop


def zlib_len_kernel(texts, level: int = LEVEL_DEFAULT):
    """Compressed byte count per text (utf-8, raw zlib stream). The
    oracle recomputes through this same function single-process."""
    import zlib

    return [len(zlib.compress(t.encode("utf-8"), level)) for t in texts]


def compression_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = LEVEL_DEFAULT,
    min_ratio_milli: int = MIN_RATIO_MILLI_DEFAULT,
    max_ratio_milli: int = MAX_RATIO_MILLI_DEFAULT,
) -> DataFrame:
    """-> (comp_len, doc_id, keep, ratio_milli, raw_len) per document."""

    @F.pandas_udf("long")
    def _comp_len(s: pd.Series) -> pd.Series:
        return pd.Series(zlib_len_kernel(s, level), index=s.index, dtype="int64")

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.octet_length(F.col(text_col)).cast("long").alias("raw_len"),
        _comp_len(F.col(text_col)).alias("comp_len"),
    )
    return base.selectExpr(
        "comp_len",
        "doc_id",
        f"CASE WHEN raw_len = 0 THEN CAST({EMPTY_SENTINEL} AS BIGINT) "
        "ELSE (comp_len * 1000) div raw_len END AS ratio_milli",
        "raw_len",
    ).selectExpr(
        "comp_len",
        "doc_id",
        f"ratio_milli BETWEEN {min_ratio_milli} AND {max_ratio_milli} AS keep",
        "ratio_milli",
        "raw_len",
    )
