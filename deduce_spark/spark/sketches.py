"""Distributed cardinality sketches: HyperLogLog register tables.

``approx_count_distinct`` (Spark's built-in HLL++) returns an estimate
whose exact value depends on internal hashing, so it cannot be
value-oracled across engines.  This module instead materializes the HLL
REGISTER TABLE itself with engine-portable integer arithmetic:

- 32-bit hash from the first 8 hex chars of md5 (same trick the other
  oracles use — DuckDB replays it exactly);
- bucket = top ``p`` bits, rho = 1 + leading-zero count of the remaining
  ``32-p`` bits, computed via the length of the binary string (``bin``
  exists in both engines) — no floats anywhere;
- registers = groupBy(bucket).max(rho): a map-side-combinable aggregate
  over at most 2^p groups, the textbook mergeable-sketch shape — at
  10^12 rows each partition reduces to <=2^p integers before the (tiny)
  shuffle, and unioning corpora is a max() of their register tables.

``hll_estimate`` turns a collected register table into the standard HLL
estimate (driver-side; 2^p <= a few KB).  Exposed separately so the
distributed artifact stays integer-exact for the correctness gate while
the float estimate remains available to callers.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_registers(
    df: DataFrame, col: str, p: int = 9
) -> DataFrame:
    """(bucket, max_rho) HLL register table for the values of ``col``.

    Null values are ignored (SQL COUNT DISTINCT semantics).  Output has
    at most 2^p rows; absent buckets mean register value 0.
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    rem_bits = 32 - p
    h32 = f"CAST(conv(substring(md5(CAST({col} AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    bucket = f"({h32}) DIV {2 ** rem_bits}"
    rem = f"({h32}) % {2 ** rem_bits}"
    rho = (
        f"CASE WHEN {rem} = 0 THEN {rem_bits + 1} "
        f"ELSE {rem_bits} - length(bin({rem})) + 1 END"
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            F.expr(bucket).cast("int").alias("bucket"),
            F.expr(rho).cast("int").alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_oracle_sql(source_sql: str, col: str, p: int = 9) -> str:
    """DuckDB twin of ``hll_registers`` over ``source_sql`` (a query or
    table exposing ``col``)."""
    rem_bits = 32 - p
    h32 = f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8)) AS BIGINT)"
    rem = f"(({h32}) % {2 ** rem_bits})"
    return f"""
        SELECT CAST(({h32}) // {2 ** rem_bits} AS INT) AS bucket,
               CAST(MAX(CASE WHEN {rem} = 0 THEN {rem_bits + 1}
                        ELSE {rem_bits} - length(bin({rem})) + 1 END) AS INT)
                   AS max_rho
        FROM ({source_sql})
        WHERE {col} IS NOT NULL
        GROUP BY 1
    """


def hll_estimate(registers: list[tuple[int, int]], p: int = 9) -> float:
    """Standard HLL estimate from (bucket, max_rho) pairs (absent buckets
    count as register 0).  Includes the small-range linear-counting
    correction; large-range correction is omitted (32-bit hash caps the
    usable range well below where it matters for corpus-level counts)."""
    m = 2 ** p
    regs = [0] * m
    for b, r in registers:
        regs[b] = max(regs[b], r)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    raw = alpha * m * m / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return raw
