"""Deterministic HyperLogLog: approximate distinct counting that two
engines compute bit-for-bit identically.

"Distinct URLs per host" over 10^10 rows is the query where exact
countDistinct starts to hurt: it shuffles every distinct key. The
standard fix is HyperLogLog (Flajolet et al. 2007) — fixed-size
register sketches that merge by max — and Spark ships it as
``approx_count_distinct``. But the builtin's xxhash64/HLL++ innards
don't exist in DuckDB, so the driver's value-hash gate could never
check it. This implementation IS the classic HLL over the repo's
md5 idiom, built so every intermediate is integer/string-exact in
both engines:

* bucket = first 2 hex chars of md5(key) (m = 256 registers);
* rho = leading-zero count of the NEXT 6 hex chars (24 bits) + 1,
  computed by STRING ops (count of leading '0' hex digits, then a
  16-way CASE on the first non-zero digit) — no float log2, no
  conv();
* register = max(rho) per bucket — a map-side-combinable agg;
* the harmonic sum is kept INTEGER by scaling: Σ 2^-M_j =
  Σ 2^(CAP - M_j) / 2^CAP, and the scaled sum (one left-shift per
  register, <= 256 * 2^23 — comfortably BIGINT) aggregates exactly;
  empty registers contribute 2^CAP each;
* only the final estimate — alpha_m * m^2 * 2^CAP / S_scaled, with
  Flajolet's small-range linear-counting correction — touches
  doubles: one identical IEEE expression on identical integers in
  both engines, rounded to 3 dp for the driver hash.

Accuracy: sigma ~= 1.04/sqrt(256) ~ 6.5% relative error.

Scale shape: ONE groupBy((group, bucket)) with max() partial
aggregation, then a 256-row-per-group rollup — sketch size is fixed
regardless of cardinality, registers merge by max across partitions
(pinned in tests), and the key column itself never shuffles (only
its 8-hex prefix does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M = 256  # registers (2 hex chars)
RHO_CAP = 24  # 6 hex chars scanned; also the integer scaling exponent
ALPHA_256 = 0.7213 / (1 + 1.079 / 256)  # Flajolet et al. 2007, m >= 128

# first non-zero hex digit -> leading zero BITS within that digit
_DIGIT_LZ = {
    "1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1,
    "8": 0, "9": 0, "a": 0, "b": 0, "c": 0, "d": 0, "e": 0, "f": 0,
}


def _rho_sql(hex6: str) -> str:
    """rho = leading zero bits of the 24-bit value + 1, capped — pure
    string ops (identical in Spark SQL and DuckDB)."""
    z = f"length(regexp_extract({hex6}, '^0*', 0))"
    d = f"substr({hex6}, {z} + 1, 1)"
    arms = " ".join(f"WHEN '{k}' THEN {v}" for k, v in _DIGIT_LZ.items())
    return (
        f"CAST(least(4 * {z} + (CASE {d} {arms} ELSE 0 END) + 1, {RHO_CAP}) "
        "AS BIGINT)"
    )


def _estimate_sql(s_scaled: str, nz: str) -> str:
    """Final float step: raw estimate + linear-counting correction.
    ``s_scaled`` = integer Σ 2^(CAP - M_j); ``nz`` = non-empty register
    count."""
    # the alpha literal must be cast: DuckDB reads a bare decimal
    # literal as DECIMAL(18,16) and overflows on * m^2 * 2^CAP
    raw = (
        f"(CAST({ALPHA_256!r} AS DOUBLE) * {M} * {M} * "
        f"{float(2 ** RHO_CAP)!r}) / CAST({s_scaled} AS DOUBLE)"
    )
    lc = f"{M} * ln(CAST({M} AS DOUBLE) / ({M} - {nz}))"
    return (
        f"round(CASE WHEN {raw} <= 2.5 * {M} AND {nz} < {M} THEN {lc} "
        f"ELSE {raw} END, 3)"
    )


def approx_distinct(
    df: DataFrame, key_col: str, group_col: str = "host"
) -> DataFrame:
    """-> (estimate, grp, n_registers) per group: deterministic HLL
    distinct-count of ``key_col`` values."""
    h = df.selectExpr(
        f"{group_col} AS grp",
        f"substr(md5({key_col}), 1, 2) AS _b",
        _rho_sql(f"substr(md5({key_col}), 3, 6)") + " AS _rho",
    )
    regs = h.groupBy("grp", "_b").agg(F.max("_rho").alias("_m"))
    per = regs.groupBy("grp").agg(
        F.expr(f"sum(shiftleft(CAST(1 AS BIGINT), {RHO_CAP} - _m))").alias("_s_nz"),
        F.count(F.lit(1)).cast("long").alias("n_registers"),
    )
    # empty registers: rho 0 -> 2^CAP each
    s = f"(_s_nz + ({M} - n_registers) * {2 ** RHO_CAP})"
    return per.selectExpr(
        _estimate_sql(s, "n_registers") + " AS estimate",
        "grp",
        "n_registers",
    ).select("estimate", "grp", "n_registers")


def approx_distinct_sql(df_sql: str, key: str = "url", group: str = "host") -> str:
    """DuckDB twin over a subquery yielding (group, key) columns."""
    rho = _rho_sql(f"substr(md5({key}), 3, 6)")
    s = f"(s_nz + ({M} - n_registers) * {2 ** RHO_CAP})"
    return f"""
WITH d AS ({df_sql}),
h AS (
  SELECT {group} AS grp, substr(md5({key}), 1, 2) AS b, {rho} AS rho
  FROM d
),
regs AS (SELECT grp, b, max(rho) AS m FROM h GROUP BY grp, b),
per AS (
  SELECT grp,
         CAST(sum(CAST(1 AS BIGINT) << ({RHO_CAP} - m)) AS BIGINT) AS s_nz,
         CAST(count(*) AS BIGINT) AS n_registers
  FROM regs GROUP BY grp
)
SELECT {_estimate_sql(s, "n_registers")} AS estimate,
       grp, n_registers
FROM per
"""
