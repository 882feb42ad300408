"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship extraction pipeline at sf0.001.
queries()      — one entry per implemented operator family (SURVEY.md §2 +
                 training-data ops), each (spark, sf_dir) -> DataFrame.
oracle_sql()   — DuckDB twins; the engine ops and the oracles share the
                 same md5-derived hashing so comparisons are exact.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from mycelium_spark.plans import entries as _entries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _entries.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_entries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_entries.ORACLES)
