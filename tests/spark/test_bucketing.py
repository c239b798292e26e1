"""Bucketed co-located join: the shuffle-elimination strategy for the
co-occurrence self-join at corpus scale.

At 10^12 pages the coOccursWith family self-joins page_entities on url —
a full shuffle of the biggest intermediate.  Writing the table bucketed by
url lets Spark plan the self-join with ZERO Exchange operators (bucket
locality replaces the shuffle).  This test pins that plan property, not
just the row values.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_entities(spark, tmp_path):
    # warehouse dir is a static conf — the session default (./spark-warehouse)
    # is used; the table is dropped (and its files deleted) on teardown
    df = spark.range(0, 2000).select(
        F.concat(F.lit("https://d"), (F.col("id") % 200).cast("string")).alias("url"),
        (F.col("id") % 97).alias("entity_id"),
    )
    name = "page_entities_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.bucketBy(8, "url")
        .sortBy("url")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(name)
    )
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_self_join_has_no_exchange(spark, bucketed_entities):
    # disable auto-broadcast: at corpus scale neither self-join side fits
    # in a broadcast, which is exactly when bucket locality matters
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = spark.table(bucketed_entities)
        joined = (
            t.alias("l")
            .join(
                t.alias("r"),
                (F.col("l.url") == F.col("r.url"))
                & (F.col("l.entity_id") < F.col("r.entity_id")),
            )
            .select("l.url", "l.entity_id", F.col("r.entity_id").alias("other"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed self-join still shuffles:\n{plan}"
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and the result matches the shuffled plan on a plain (unbucketed) copy
    plain = spark.table(bucketed_entities).localCheckpoint()
    expected = (
        plain.alias("l")
        .join(
            plain.alias("r"),
            (F.col("l.url") == F.col("r.url"))
            & (F.col("l.entity_id") < F.col("r.entity_id")),
        )
        .count()
    )
    assert joined.count() == expected > 0
