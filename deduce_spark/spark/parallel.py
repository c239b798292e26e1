"""Scale-adaptive input fan-out for CPU-heavy stages.

A parquet fixture written as one row group yields a ONE-partition scan no
matter how small ``spark.sql.files.maxPartitionBytes`` is (row groups do
not split), so an Arrow/pandas UDF or higher-order-function compute stage
fed straight from such a scan runs on a single core.  ``fan_out`` inserts
a repartition ONLY when the input arrives in fewer partitions than the
session can use; at production scale the input already has more
partitions than the target and the helper is a provable no-op — the
guard keeps it from ADDING a shuffle where data is already spread
(optimization guide §2.4: remove shuffles, don't introduce them).

The shuffled bytes are the narrow projection the compute stage needs
(id + text / id + vector), not the full row — callers project first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, key: str | None = None, waves: int = 2) -> DataFrame:
    """Repartition ``df`` to ``waves`` task waves per core when it has
    fewer partitions than that target; otherwise return it unchanged.

    Default is ROUND-ROBIN repartition: it spreads both row count and
    bytes evenly (hash-partitioning on an id can correlate with payload
    size and leave stragglers — measured 2.2x slower than round-robin on
    the 50k-doc minhash signature stage), and it is retry-stable because
    ``spark.sql.execution.sortBeforeRepartition`` (default on) sorts the
    partition locally before dealing rows.  ``key`` opts into
    deterministic hash partitioning when a downstream operation needs
    co-partitioning by that column."""
    sc = df.sparkSession.sparkContext
    target = max(sc.defaultParallelism, 1) * waves
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - planning quirks never fatal
        return df
    if n >= target:
        return df
    if key is not None:
        return df.repartition(target, F.col(key))
    return df.repartition(target)
