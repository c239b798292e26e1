"""Structured Streaming ingestion: incremental batches, exactly-once sink."""

import shutil
from pathlib import Path

from deduce_spark.fixtures import write_pages_parquet
from deduce_spark.spark import lineage as lin
from deduce_spark.spark.icetable import IceTable
from deduce_spark.spark.streaming import (
    StreamingMentionsWriter,
    stream_pages_to_mentions,
)


def _stage_files(src_dir: str, dst: Path, names: list[str]) -> None:
    dst.mkdir(parents=True, exist_ok=True)
    for n in names:
        shutil.copy(Path(src_dir) / n, dst / n)


def test_incremental_batches_accumulate_exactly_once(
    spark, pipeline, tmp_path
):
    pages_path = str(
        write_pages_parquet(tmp_path / "pages", n_pages=80, pages_per_file=32)
    )
    files = sorted(p.name for p in Path(pages_path).glob("*.parquet"))
    assert len(files) >= 2, "need multiple files to form multiple batches"
    stream_in = tmp_path / "incoming"
    out_root = tmp_path / "kg_stream"
    ckpt = tmp_path / "ckpt"

    # batch 1: first file only
    _stage_files(pages_path, stream_in, files[:1])
    q = stream_pages_to_mentions(
        spark, str(stream_in), out_root, str(ckpt),
        pipe=pipeline, n_parts=4, max_files_per_trigger=1,
    )
    q.awaitTermination()
    table = IceTable(out_root / "mentions")
    rows_b1 = table.read(spark).count()
    assert rows_b1 > 0
    batches_seen = {
        r["batch_id"]
        for r in lin.LineageLog(out_root / "_lineage").records()
        if r.get("kind") == "stream_batch"
    }
    assert batches_seen == {0}

    # batch 2: stage the remaining files, restart the stream (availableNow
    # terminates after draining) — the checkpoint resumes past batch 0
    _stage_files(pages_path, stream_in, files[1:])
    q = stream_pages_to_mentions(
        spark, str(stream_in), out_root, str(ckpt),
        pipe=pipeline, n_parts=4, max_files_per_trigger=8,
    )
    q.awaitTermination()
    total = table.read(spark).count()
    assert total > rows_b1
    # streamed total == one-shot batch annotate of the same pages
    pages = spark.read.parquet(pages_path)
    expected = pipeline.mentions_long(
        pipeline.annotate_pages(pages, lang="nl", with_text=False,
                                with_redacted=False)
    ).count()
    assert total == expected


def test_replayed_batch_is_idempotent(spark, pipeline, pages_path, tmp_path):
    out_root = tmp_path / "kg_replay"
    writer = StreamingMentionsWriter(pipeline, out_root, n_parts=4)
    batch = spark.read.parquet(pages_path).limit(20)
    writer(batch, 7)
    table = IceTable(out_root / "mentions")
    first = table.read(spark).count()

    # replay WITHOUT a lineage record (simulates crash between table commit
    # and lineage append): overwrite-partitions swaps batch 7's partitions
    log_dir = out_root / "_lineage"
    for f in log_dir.glob("lineage-*.jsonl"):
        f.unlink()
    writer(batch, 7)
    assert table.read(spark).count() == first

    # replay WITH the lineage record: skipped before any compute
    snap_before = table.current_version()
    writer(batch, 7)
    assert table.current_version() == snap_before


def test_streamed_mentions_feed_kg_only_build(spark, pipeline, tmp_path):
    """stream_ingest -> build_kg --kg-only yields the SAME graph as the
    one-shot batch job on the same pages (streaming == batch equivalence)."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parents[2] / "jobs"))
    from build_kg import run_job

    pages_path = str(
        write_pages_parquet(tmp_path / "pages", n_pages=60, pages_per_file=30)
    )
    out_stream = tmp_path / "via_stream"
    q = stream_pages_to_mentions(
        spark, pages_path, out_stream, str(tmp_path / "ck"),
        pipe=pipeline, n_parts=4,
    )
    q.awaitTermination()
    s1 = run_job(spark, None, str(out_stream), kg_only=True,
                 engine=pipeline._engine_bc.value)
    out_batch = tmp_path / "via_batch"
    s2 = run_job(spark, pages_path, str(out_batch), n_parts=4,
                 engine=pipeline._engine_bc.value)
    assert (s1["nodes_rows"], s1["edges_rows"]) == (
        s2["nodes_rows"], s2["edges_rows"])
