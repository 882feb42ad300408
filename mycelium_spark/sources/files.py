"""Local-file sources: directory scan + extension filter + text conversion.

Spark-native replacement for the reference's local_indexer file pipeline:
* S8 recursive directory walk + extension filter
  (/root/reference/src/local_indexer/local_indexer.cc:134-175 and
  dist/local_indexer.py:40-49) → ``spark.read.format("binaryFile")`` with
  ``recursiveFileLookup`` and a lower-cased extension filter;
* fork-per-file parallelism (local_indexer.cc:150-166) → task parallelism;
* file:// URL derivation + normalization (dist/local_indexer.py:75-77);
* control-char filter + UTF-8 validation on the extracted text
  (local_indexer.cc:74-82; dist/utils/__init__.py:20-28) with the
  http_code 200/415 convention (dist/local_indexer.py:78-97);
* S9 PDF→text requires a pdftotext binary the container lacks — rows with
  a .pdf extension get http_code 415 and null text (the reference uses 415
  for failed PDF conversion too, local_indexer.cc:127);
* S11 gzip: Spark decompresses ``.gz`` text transparently (read_gzip_text).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.text import filter_ascii_control, valid_utf8
from ..functions.url import BadUrl, Url

TEXT_EXTENSIONS = ("txt",)
PDF_EXTENSIONS = ("pdf",)


def scan_files(
    spark: SparkSession, path: str, extensions: tuple[str, ...] = TEXT_EXTENSIONS + PDF_EXTENSIONS
) -> DataFrame:
    """Recursive binary-file scan filtered by lower-cased extension."""
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    ext = F.lower(F.substring_index(F.col("path"), ".", -1))
    return df.withColumn("ext", ext).filter(F.col("ext").isin(*extensions))


_DOC_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("http_code", IntegerType()),
        StructField("text", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def index_local_files(files: DataFrame) -> DataFrame:
    """files (path, content, ext) → docs rows with file:// urls.

    Mirrors Indexer.file(): normalize the file:// url, convert to text
    (txt: control-filter + utf-8 check → 200, else 415; pdf: the native
    common-subset extractor in functions/pdftext.py → control-filter +
    200 on success, 415 on anything it can't parse — the same
    success/415 split as the pdftotext shell-out, local_indexer.cc:112-131),
    never per-row Python from Spark's perspective (mapInPandas batches).
    """
    from ..functions.pdftext import pdf_extract_text

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, codes, texts, sizes = [], [], [], []
            for path, content, ext in zip(pdf["path"], pdf["content"], pdf["ext"]):
                raw = bytes(content) if content is not None else b""
                sizes.append(len(raw))
                p = path
                if p.startswith("file:"):
                    p = p[5:]
                try:
                    u = Url(("file://" + p).encode())
                    u.normalize()
                    urls.append(u.to_string())
                except BadUrl:
                    urls.append("file://" + p)
                if ext == "txt":
                    cleaned = filter_ascii_control(raw)
                    if valid_utf8(cleaned):
                        codes.append(200)
                        texts.append(cleaned.decode("utf-8"))
                    else:
                        codes.append(415)
                        texts.append(None)
                else:  # pdf: native extractor; failure → 415 (local_indexer.cc:127)
                    txt = pdf_extract_text(raw)
                    if txt is not None:
                        cleaned = filter_ascii_control(txt.encode("utf-8"))
                        codes.append(200)
                        texts.append(cleaned.decode("utf-8"))
                    else:
                        codes.append(415)
                        texts.append(None)
            yield pd.DataFrame(
                {"url": urls, "http_code": codes, "text": texts, "n_bytes": sizes}
            )

    return files.select("path", "content", "ext").mapInPandas(run, _DOC_SCHEMA)


def read_gzip_text(spark: SparkSession, path: str) -> DataFrame:
    """S11: gzip-compressed line text — Spark codecs handle .gz natively."""
    return spark.read.text(path)
