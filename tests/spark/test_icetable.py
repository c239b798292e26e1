"""Iceberg-layout table: snapshots, dynamic partition overwrite, pruning."""

import json

import pytest

from deduce_spark.spark.icetable import IceTable


@pytest.fixture()
def table(tmp_path):
    return IceTable(tmp_path / "t")


def _df(spark, rows):
    return spark.createDataFrame(rows, "part_id int, k string, v long")


def test_roundtrip_partitioned(spark, table):
    df = _df(spark, [(0, "a", 1), (0, "b", 2), (1, "c", 3)])
    man = table.write(df, partition_by=("part_id",))
    assert man["snapshot_id"] == 1
    assert man["summary"]["total_rows"] == 3
    got = table.read(spark).orderBy("v").collect()
    assert [(r.part_id, r.k, r.v) for r in got] == [(0, "a", 1), (0, "b", 2), (1, "c", 3)]
    stats = {s["partition"]["part_id"]: s["rows"] for s in table.partition_stats()}
    assert stats == {"0": 2, "1": 1}


def test_overwrite_partitions_swaps_only_written(spark, table):
    table.write(_df(spark, [(0, "a", 1), (1, "c", 3)]), partition_by=("part_id",))
    # rewrite only part 1; part 0 must be inherited from snapshot 1
    table.write(_df(spark, [(1, "z", 9)]), partition_by=("part_id",),
                mode="overwrite-partitions")
    got = sorted((r.part_id, r.k, r.v) for r in table.read(spark).collect())
    assert got == [(0, "a", 1), (1, "z", 9)]
    # time travel: snapshot 1 still shows the old part 1
    old = sorted((r.part_id, r.v) for r in table.read(spark, snapshot_id=1).collect())
    assert old == [(0, 1), (1, 3)]
    assert [s["snapshot_id"] for s in table.snapshots()] == [1, 2]


def test_append_and_full_overwrite(spark, table):
    table.write(_df(spark, [(0, "a", 1)]), partition_by=("part_id",))
    table.write(_df(spark, [(0, "b", 2)]), partition_by=("part_id",), mode="append")
    assert table.read(spark).count() == 2
    table.write(_df(spark, [(5, "x", 7)]), partition_by=("part_id",), mode="overwrite")
    got = [(r.part_id, r.k, r.v) for r in table.read(spark).collect()]
    assert got == [(5, "x", 7)]


def test_manifest_side_partition_pruning(spark, table):
    table.write(_df(spark, [(i, "k", i) for i in range(4)]), partition_by=("part_id",))
    pruned = table.read(spark, partition_filter=lambda p: p["part_id"] == "2")
    rows = pruned.collect()
    assert [(r.part_id, r.v) for r in rows] == [(2, 2)]
    # pruning happened before Spark: the scan's file list has one partition dir
    scan_files = pruned.inputFiles()
    assert all("part_id=2" in f for f in scan_files)


def test_unpartitioned_and_empty_read(spark, table):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    table.write(df)
    assert table.read(spark).count() == 1
    empty = table.read(spark, partition_filter=lambda p: False)
    assert empty.count() == 0
    assert empty.schema == df.schema


def test_crash_before_commit_is_invisible(spark, table, tmp_path):
    table.write(_df(spark, [(0, "a", 1)]), partition_by=("part_id",))
    # simulate a writer that wrote data + manifest but died before the
    # version-hint replace: reader still resolves snapshot 1
    (table.meta_dir / "snap-99.json").write_text("{}")
    assert table.current_version() == 1
    assert table.read(spark).count() == 1


def test_expire_snapshots_gc(spark, table, tmp_path):
    table.write(_df(spark, [(0, "a", 1), (1, "b", 2)]), partition_by=("part_id",))
    table.write(_df(spark, [(1, "z", 9)]), partition_by=("part_id",),
                mode="overwrite-partitions")
    table.write(_df(spark, [(0, "q", 5)]), partition_by=("part_id",),
                mode="overwrite-partitions")
    before = sorted((r.part_id, r.k, r.v) for r in table.read(spark).collect())
    stats = table.expire_snapshots(keep_last=1)
    # snapshot 2's part 1 dir is still referenced (inherited) and must
    # survive; snapshot 1's replaced dirs are gone
    assert stats["expired"] == [1, 2] and stats["deleted_dirs"] >= 1
    after = sorted((r.part_id, r.k, r.v) for r in table.read(spark).collect())
    assert after == before == [(0, "q", 5), (1, "z", 9)]
    assert [s["snapshot_id"] for s in table.snapshots()] == [3]
    # expired manifests removed, current still readable
    assert not (table.meta_dir / "snap-1.json").exists()
    # next write after expiry commits cleanly
    table.write(_df(spark, [(2, "n", 7)]), partition_by=("part_id",),
                mode="overwrite-partitions")
    assert table.read(spark).count() == 3


def test_partition_spec_change_requires_full_overwrite(spark, table):
    table.write(_df(spark, [(0, "a", 1)]), partition_by=("part_id",))
    with pytest.raises(ValueError, match="partition spec change"):
        table.write(_df(spark, [(0, "b", 2)]), partition_by=("part_id", "k"),
                    mode="overwrite-partitions")
    with pytest.raises(ValueError, match="partition spec change"):
        table.write(_df(spark, [(0, "b", 2)]), mode="append")
    # explicit full overwrite is the sanctioned path
    table.write(_df(spark, [(0, "b", 2)]), partition_by=("part_id", "k"),
                mode="overwrite")
    assert table.read(spark).count() == 1


def test_compact_small_files(spark, tmp_path):
    from pyspark.sql import functions as F

    t = IceTable(tmp_path / "t")
    df = spark.range(0, 4000).select(
        (F.col("id") % 4).cast("string").alias("part_id"), F.col("id").alias("v")
    )
    # force many small files per partition
    t.write(df.repartition(16), partition_by=("part_id",), mode="overwrite")
    before = t.manifest()
    assert all(len(e["files"]) > 4 for e in before["entries"])
    pre_rows = sorted(r["v"] for r in t.read(spark).collect())
    pre_snap = before["snapshot_id"]

    res = t.compact(spark, max_files_per_partition=4, files_per_partition=1)
    assert res["compacted_partitions"] == 4
    assert res["files_after"] < res["files_before"]
    after = t.manifest()
    assert all(len(e["files"]) <= 2 for e in after["entries"])
    # data identical, old snapshot still readable (time travel intact)
    assert sorted(r["v"] for r in t.read(spark).collect()) == pre_rows
    assert sorted(r["v"] for r in t.read(spark, snapshot_id=pre_snap).collect()) == pre_rows
    # idempotent: nothing left to compact
    assert t.compact(spark, max_files_per_partition=4)["compacted_partitions"] == 0


def test_column_stats_data_skipping(spark, tmp_path):
    from pyspark.sql import functions as F

    t = IceTable(tmp_path / "t")
    # part p0 holds v in [0, 999], p1 in [1000, 1999], p2 in [2000, 2999]
    df = spark.range(0, 3000).select(
        F.floor(F.col("id") / 1000).cast("string").alias("part_id"),
        F.col("id").alias("v"),
    )
    t.write(df.repartition("part_id"), partition_by=("part_id",), mode="overwrite")
    man = t.manifest()
    assert all("v" in (e.get("stats") or {}) for e in man["entries"])

    # range (1200, 1800) intersects only p1 -> exactly one entry scanned
    pruned = t.read(spark, column_range={"v": (1200, 1800)})
    rows = pruned.filter((F.col("v") >= 1200) & (F.col("v") <= 1800)).count()
    assert rows == 601
    # (Spark re-infers the discovered partition column as int)
    parts = {str(r["part_id"]) for r in pruned.select("part_id").distinct().collect()}
    assert parts == {"1"}

    # open-ended bound and a column without stats are safe
    assert t.read(spark, column_range={"v": (2500, None)}).count() == 1000
    assert t.read(spark, column_range={"nope": (0, 1)}).count() == 3000


def test_upsert_partition_scoped(spark, tmp_path):
    from pyspark.sql import functions as F

    t = IceTable(tmp_path / "t")
    base = spark.range(0, 300).select(
        (F.col("id") % 3).cast("string").alias("part_id"),
        F.col("id").alias("k"),
        F.lit("old").alias("val"),
    )
    t.write(base.repartition("part_id"), partition_by=("part_id",), mode="overwrite")
    snap0 = t.manifest()["snapshot_id"]
    dirs_before = {
        json.dumps(e["partition"]): e["dir"] for e in t.manifest()["entries"]
    }

    # update k=1 (lives in part 1) and insert a brand-new key into part 1
    up = spark.createDataFrame(
        [("1", 1, "new"), ("1", 9001, "new")],
        "part_id string, k long, val string",
    )
    t.upsert(up, keys=["k"])

    cur = {r["k"]: r["val"] for r in t.read(spark).collect()}
    assert len(cur) == 301
    assert cur[1] == "new" and cur[9001] == "new" and cur[2] == "old"
    # untouched partitions inherited (same dirs), only part 1 rewritten
    dirs_after = {
        json.dumps(e["partition"]): e["dir"] for e in t.manifest()["entries"]
    }
    assert dirs_after['{"part_id": "0"}'] == dirs_before['{"part_id": "0"}']
    assert dirs_after['{"part_id": "2"}'] == dirs_before['{"part_id": "2"}']
    assert dirs_after['{"part_id": "1"}'] != dirs_before['{"part_id": "1"}']
    # time travel: the pre-upsert snapshot still shows the old value
    old = {r["k"]: r["val"] for r in t.read(spark, snapshot_id=snap0).collect()}
    assert old[1] == "old" and 9001 not in old


def test_schema_evolution_add_column(spark, table):
    table.write(_df(spark, [(0, "a", 1), (1, "b", 2)]), partition_by=("part_id",))
    # later snapshot adds a column; earlier leaves lack it on disk
    evolved = spark.createDataFrame(
        [(2, "c", 3, "extra")], "part_id int, k string, v long, note string"
    )
    table.write(evolved, partition_by=("part_id",), mode="append")
    got = {r.k: (r.v, r.note) for r in table.read(spark).collect()}
    # old rows read under the CURRENT schema with nulls back-filled
    assert got == {"a": (1, None), "b": (2, None), "c": (3, "extra")}
    # time travel to the pre-evolution snapshot also uses the latest schema
    old = table.read(spark, snapshot_id=1)
    assert "note" in old.columns
    assert {r.note for r in old.collect()} == {None}
