"""Backend-switch tests: parquet fallback pinned everywhere; the real
Iceberg path exercised when the runtime has the jars (skipped otherwise)."""

import pytest
from pyspark.sql import functions as F

from deduce_spark.spark import iceberg_catalog as ic


def _has_iceberg(spark) -> bool:
    return ic.iceberg_available(spark)


def test_default_impl_is_parquet_icetable(spark, tmp_path):
    from deduce_spark.spark.icetable import IceTable

    t = ic.open_table(spark, str(tmp_path / "t"))
    assert isinstance(t, IceTable)
    df = spark.range(10).select(
        (F.col("id") % 2).cast("string").alias("p"), F.col("id").alias("k")
    )
    t.write(df, partition_by=("p",), mode="overwrite")
    assert t.read(spark).count() == 10


def test_iceberg_requested_without_jars_is_loud(spark, tmp_path):
    if _has_iceberg(spark):
        pytest.skip("iceberg jars present; the loud-failure path is moot")
    spark.conf.set(ic.CONF_IMPL, "iceberg")
    try:
        with pytest.raises(RuntimeError, match="no Iceberg classes"):
            ic.open_table(spark, str(tmp_path / "t"))
    finally:
        spark.conf.set(ic.CONF_IMPL, "parquet")


def test_unknown_impl_rejected(spark, tmp_path):
    spark.conf.set(ic.CONF_IMPL, "deltalake")
    try:
        with pytest.raises(ValueError, match="unknown"):
            ic.open_table(spark, str(tmp_path / "t"))
    finally:
        spark.conf.set(ic.CONF_IMPL, "parquet")


@pytest.fixture
def iceberg_spark(spark):
    if not _has_iceberg(spark):
        pytest.skip("no Iceberg jars on the Spark classpath")
    if spark.conf.get("spark.sql.catalog.it_cat", None) is None:
        pytest.skip("spark.sql.catalog.it_cat not configured (static conf)")
    spark.conf.set(ic.CONF_IMPL, "iceberg")
    spark.conf.set(ic.CONF_CATALOG, "it_cat")
    yield spark
    spark.conf.set(ic.CONF_IMPL, "parquet")


def test_iceberg_roundtrip_and_merge(iceberg_spark, tmp_path):
    """Runs only with iceberg-spark-runtime on the classpath and an
    ``it_cat`` catalog configured; validates the adapter's API mapping:
    create/append/dynamic-overwrite, MERGE upsert, snapshots listing."""
    spark = iceberg_spark
    t = ic.open_table(spark, str(tmp_path / "events"), name="db.events_it")
    assert isinstance(t, ic.IcebergTable)
    base = spark.createDataFrame(
        [("a", 1, "old"), ("a", 2, "old"), ("b", 3, "old")],
        "p string, k long, val string",
    )
    t.write(base, partition_by=("p",), mode="overwrite")
    assert t.read().count() == 3

    t.write(
        spark.createDataFrame([("c", 4, "new")], "p string, k long, val string"),
        partition_by=("p",),
        mode="append",
    )
    assert t.read().count() == 4

    t.upsert(
        spark.createDataFrame([("a", 1, "upd")], "p string, k long, val string"),
        keys=["k"],
    )
    vals = {r["k"]: r["val"] for r in t.read().collect()}
    assert vals[1] == "upd" and vals[2] == "old"
    assert len(t.snapshots()) >= 3
