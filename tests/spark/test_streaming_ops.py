"""Watermarked windowed aggregation + applyInPandasWithState sessionizer.

Both tests drive two consecutive ``availableNow`` runs over one checkpoint:
the watermark / operator state persists in the state store between runs,
which is exactly how an incremental crawl-feed job restarts in production.
"""

import datetime as dt
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from deduce_spark.spark.stages import AnnotatePipeline
from deduce_spark.spark import streaming as st

UTC = dt.timezone.utc

PAGES_SCHEMA = "url string, warc_ts timestamp, text string, lang string"


def _pages_rows(*hours_minutes):
    base = dt.datetime(2024, 3, 1, tzinfo=UTC)
    return [
        (
            f"https://example.nl/p{h}_{m}",
            base + dt.timedelta(hours=h, minutes=m),
            "Afspraak op 12 maart 2020 in de kliniek.",
            "nl",
        )
        for h, m in hours_minutes
    ]


@pytest.fixture(scope="module")
def pipe(spark):
    return AnnotatePipeline(spark)


def _run_stream(spark, src_dir, checkpoint, make_sink_df, collected,
                schema=PAGES_SCHEMA):
    stream = spark.readStream.schema(schema).parquet(str(src_dir))
    out = make_sink_df(stream)

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(checkpoint))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_windowed_tag_counts_watermark(spark, pipe, tmp_path):
    src = tmp_path / "pages"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def build(stream):
        return st.windowed_tag_counts(
            stream, pipe, window="1 hour", watermark="2 hours",
            from_html=False,
        )

    # run 1: rows in hour-windows 0,0,1,2,3,5 -> final watermark 03:10
    spark.createDataFrame(
        _pages_rows((0, 10), (0, 20), (1, 10), (2, 10), (3, 10), (5, 10)),
        PAGES_SCHEMA,
    ).coalesce(1).write.parquet(str(src / "f1"))
    got1: list = []
    _run_stream(spark, f"{src}/*", ckpt, build, got1)
    # the final watermark (05:10 - 2h = 03:10) closes hour-windows 0,1,2;
    # append mode emits each exactly once
    datum1 = {
        r["window_start"].hour: r["n"] for r in got1 if r["tag"] == "datum"
    }
    assert datum1 == {0: 2, 1: 1, 2: 1}

    # run 2: one on-time page (06:10) + one LATE page (00:30, behind the
    # persisted 03:10 watermark -> must be dropped)
    spark.createDataFrame(
        _pages_rows((6, 10), (0, 30)), PAGES_SCHEMA
    ).coalesce(1).write.parquet(str(src / "f2"))
    got2: list = []
    _run_stream(spark, f"{src}/*", ckpt, build, got2)

    datum2 = {
        r["window_start"].hour: r["n"] for r in got2 if r["tag"] == "datum"
    }
    # the new watermark (06:10 - 2h = 04:10) closes window 3 only; the late
    # 00:30 page produced NO resurrected window-0 row (dropped by the
    # persisted watermark) and window 5 stays open
    assert datum2 == {3: 1}


EVENTS_SCHEMA = "user_id long, ts timestamp"


def test_sessionize_stateful_across_runs(spark, tmp_path):
    src = tmp_path / "events"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    base = dt.datetime(2024, 3, 1, 10, 0, tzinfo=UTC)

    def rows(*minutes):
        return [(7, base + dt.timedelta(minutes=m)) for m in minutes]

    # run 1: two events 10 minutes apart -> one open session
    spark.createDataFrame(rows(0, 10), EVENTS_SCHEMA).coalesce(1).write.parquet(
        str(src / "f1")
    )
    got1: list = []
    _run_stream(spark, f"{src}/*", ckpt, st.sessionize_events_stateful, got1,
                schema=EVENTS_SCHEMA)
    assert [(r["session_id"], r["n_events"]) for r in got1] == [(1, 2)]

    # run 2: +15 min extends session 1 (state survived the restart);
    # +3 hours opens session 2
    spark.createDataFrame(rows(25, 180), EVENTS_SCHEMA).coalesce(1).write.parquet(
        str(src / "f2")
    )
    got2: list = []
    _run_stream(spark, f"{src}/*", ckpt, st.sessionize_events_stateful, got2,
                schema=EVENTS_SCHEMA)
    snap = {r["session_id"]: r["n_events"] for r in got2}
    assert snap == {1: 3, 2: 1}
    s1 = next(r for r in got2 if r["session_id"] == 1)
    assert s1["first_ts"] == base.replace(tzinfo=None)
    assert s1["last_ts"] == (base + dt.timedelta(minutes=25)).replace(tzinfo=None)


def test_dedup_pages_stream_within_watermark(spark, tmp_path):
    """Duplicate urls inside the watermark horizon are dropped across
    micro-batch boundaries (state persists in the checkpoint); a re-crawl
    far beyond the watermark passes through as a fresh page."""
    src = tmp_path / "pages_dd"
    ckpt = tmp_path / "ckpt_dd"
    src.mkdir()
    collected = []

    base = dt.datetime(2024, 3, 1, tzinfo=UTC)

    def rows(*specs):
        return [
            (
                f"https://example.nl/{name}",
                base + dt.timedelta(hours=h),
                "tekst",
                "nl",
            )
            for name, h in specs
        ]

    # batch 1: a + its immediate duplicate + b
    spark.createDataFrame(
        rows(("a", 0), ("a", 0), ("b", 0)), PAGES_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    _run_stream(spark, src, ckpt, st.dedup_pages_stream, collected)

    # batch 2 (same checkpoint): a again within the 2h watermark -> dropped;
    # c is new
    spark.createDataFrame(
        rows(("a", 1), ("c", 1)), PAGES_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    _run_stream(spark, src, ckpt, st.dedup_pages_stream, collected)

    # batch 3 advances the watermark (max event time 71h - 2h delay = 69h),
    # which evicts the day-1 keys from state at the NEXT batch...
    spark.createDataFrame(rows(("d", 71)), PAGES_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    _run_stream(spark, src, ckpt, st.dedup_pages_stream, collected)

    # ...so batch 4's re-crawl of a (3 days after the original) is kept
    spark.createDataFrame(
        rows(("a", 72), ("b", 72)), PAGES_SCHEMA
    ).coalesce(1).write.mode("append").parquet(str(src))
    _run_stream(spark, src, ckpt, st.dedup_pages_stream, collected)

    seen = sorted(
        (r["url"].rsplit("/", 1)[1], r["warc_ts"].day) for r in collected
    )
    # batch 1: one copy of a, one b; batch 2: only c (a was in-watermark)
    assert seen.count(("a", 1)) == 1
    assert seen.count(("b", 1)) == 1
    assert seen.count(("c", 1)) == 1
    # the 3-days-later re-crawl of a survives: its state was evicted
    assert seen.count(("a", 4)) == 1
    assert seen.count(("b", 4)) == 1
    assert len(seen) == 6  # a@d1, b@d1, c@d1, d@d3, a@d4, b@d4


def test_hll_registers_stream_folds_to_batch_sketch(spark, tmp_path):
    """Streaming HLL maintenance: update-mode register deltas, folded with
    max() in the sink, equal the batch sketch over the union of all
    batches — across a checkpoint restart, with bounded (<=2^p) state."""
    from deduce_spark.spark.sketches import hll_registers

    src = tmp_path / "vals"
    ckpt = tmp_path / "ckpt_hll"
    src.mkdir()
    schema = "v string"
    folded: dict[int, int] = {}

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = st.hll_registers_stream(stream, "v", p=6)

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                b, rho = r["bucket"], r["max_rho"]
                folded[b] = max(folded.get(b, 0), rho)

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def write_batch(values):
        spark.createDataFrame([(v,) for v in values], schema).coalesce(
            1
        ).write.mode("append").parquet(str(src))

    write_batch([f"x{i}" for i in range(300)])
    run_once()
    write_batch([f"x{i}" for i in range(150, 450)])  # overlap + new
    run_once()  # fresh query object, same checkpoint = restart
    write_batch([f"y{i}" for i in range(100)])
    run_once()

    batch = {
        r["bucket"]: r["max_rho"]
        for r in hll_registers(
            spark.createDataFrame(
                [(f"x{i}",) for i in range(450)]
                + [(f"y{i}",) for i in range(100)],
                schema,
            ),
            "v",
            p=6,
        ).collect()
    }
    assert folded == batch
    assert len(folded) <= 64


def test_bloom_stream_folds_to_batch_sketch(spark, tmp_path):
    """Streaming Bloom maintenance: update-mode word deltas, folded with
    bit_or in the sink, equal the batch filter over the union of all
    batches — across a checkpoint restart, with bounded (<=m_words)
    state — and the folded filter has no false negatives."""
    from deduce_spark.spark.sketches import bloom_build, bloom_probe

    M, N = 16, 4
    src = tmp_path / "bvals"
    ckpt = tmp_path / "ckpt_bloom"
    src.mkdir()
    schema = "v string"
    folded: dict[int, int] = {}

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = st.bloom_stream(stream, "v", m_words=M, n_hashes=N)

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                w, bits = r["word_idx"], r["bits"]
                folded[w] = folded.get(w, 0) | bits

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def write_batch(values):
        spark.createDataFrame([(v,) for v in values], schema).coalesce(
            1
        ).write.mode("append").parquet(str(src))

    write_batch([f"x{i}" for i in range(200)])
    run_once()
    write_batch([f"x{i}" for i in range(100, 300)])  # overlap + new
    run_once()  # fresh query object, same checkpoint = restart
    write_batch([f"y{i}" for i in range(50)])
    run_once()

    union = spark.createDataFrame(
        [(f"x{i}",) for i in range(300)] + [(f"y{i}",) for i in range(50)],
        schema,
    )
    batch = {
        r["word_idx"]: r["bits"]
        for r in bloom_build(union, "v", m_words=M, n_hashes=N).collect()
    }
    assert folded == batch
    assert len(folded) <= M
    # no false negatives through the streamed-then-folded filter
    bloom_df = spark.createDataFrame(
        list(folded.items()), "word_idx long, bits long"
    )
    missed = (
        bloom_probe(bloom_df, union, "v", m_words=M, n_hashes=N)
        .filter("NOT member")
        .count()
    )
    assert missed == 0


def test_heavy_hitters_stream_bounded_state_and_guarantee(spark, tmp_path):
    """Streaming MG maintenance: a persistently heavy item survives batch
    churn and a checkpoint restart; state stays <= k counters per bucket;
    mg_count underestimates the true count by at most n_seen/(k+1)."""
    src = tmp_path / "items"
    ckpt = tmp_path / "ckpt_hh"
    src.mkdir()
    schema = "item string"
    K = 8
    latest: dict[tuple[int, str], tuple[int, int]] = {}
    bucket_seen: dict[int, int] = {}

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = st.heavy_hitters_stream(stream, "item", n_buckets=2, k=K)

        def sink(batch_df, batch_id):
            rows = batch_df.collect()
            for b in {r["bucket"] for r in rows}:
                # full-snapshot semantics: a touched bucket replaces its rows
                for key in [key for key in latest if key[0] == b]:
                    del latest[key]
            for r in rows:
                latest[(r["bucket"], r["item"])] = (r["mg_count"], r["n_seen"])
                bucket_seen[r["bucket"]] = r["n_seen"]

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def write_batch(values):
        spark.createDataFrame([(v,) for v in values], schema).coalesce(
            1
        ).write.mode("append").parquet(str(src))

    true_hot = 0
    for gen in range(3):
        batch = ["hot"] * 40 + [f"churn{gen}_{j}" for j in range(60)]
        true_hot += 40
        write_batch(batch)
        run_once()  # fresh query object, same checkpoint = restart

    # bounded state: at most k surviving counters per bucket
    per_bucket: dict[int, int] = {}
    for (b, _i), _v in latest.items():
        per_bucket[b] = per_bucket.get(b, 0) + 1
    assert per_bucket and all(v <= K for v in per_bucket.values())
    # the heavy item survives with a within-bound underestimate
    hot = [(b, v) for (b, i), v in latest.items() if i == "hot"]
    assert len(hot) == 1
    (bucket, (mg_count, n_seen)) = hot[0]
    assert mg_count <= true_hot
    assert true_hot - mg_count <= n_seen // (K + 1)
    # n_seen on the hot bucket covers every item hashed there (120 hots
    # plus that bucket's churn share), never the whole stream
    assert n_seen >= true_hot
    assert n_seen <= 300


def test_cms_stream_folds_to_batch_sketch(spark, tmp_path):
    """Streaming Count-Min maintenance: update-mode cell deltas carry the
    CUMULATIVE count (streaming SUM state), so keeping the latest value
    per (row_i, bucket) across batches — and a checkpoint restart —
    equals the batch grid over the union of all batches, with bounded
    (<= depth*width) state."""
    from deduce_spark.spark.sketches import cms_build

    W, D = 16, 3
    src = tmp_path / "cvals"
    ckpt = tmp_path / "ckpt_cms"
    src.mkdir()
    schema = "v string"
    folded: dict[tuple, int] = {}

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = st.cms_stream(stream, "v", width=W, depth=D)

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                folded[(r["row_i"], r["bucket"])] = r["cnt"]

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(ckpt))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def write_batch(values):
        spark.createDataFrame([(v,) for v in values], schema).coalesce(
            1
        ).write.mode("append").parquet(str(src))

    write_batch([f"x{i % 7}" for i in range(40)])
    run_once()
    write_batch([f"x{i % 11}" for i in range(30)])  # overlap + new
    run_once()  # fresh query object, same checkpoint = restart
    write_batch([f"z{i}" for i in range(5)])
    run_once()

    union = spark.createDataFrame(
        [(f"x{i % 7}",) for i in range(40)]
        + [(f"x{i % 11}",) for i in range(30)]
        + [(f"z{i}",) for i in range(5)],
        schema,
    )
    batch = {
        (r["row_i"], r["bucket"]): r["cnt"]
        for r in cms_build(union, "v", width=W, depth=D).collect()
    }
    assert folded == batch
    assert len(folded) <= W * D
