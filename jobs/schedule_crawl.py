"""Crawl-scheduling job — the fetch-side companion to curate_corpus.

    python jobs/package_pyfiles.py                   # -> dist/kgspark.zip
    spark-submit --py-files dist/kgspark.zip \\
        jobs/schedule_crawl.py --input /tmp/crawl/pages.parquet \\
        --output /tmp/schedule \\
        [--previous /tmp/prev_pages.parquet] \\
        [--robots /tmp/robots.parquet] [--history /tmp/history.parquet]

Composes the crawl operators into the loop a production crawler runs
between fetch rounds, in order:

    delta     crawl_delta vs the --previous snapshot (md5 text digest):
              added | changed | unchanged | deleted per url; without
              --previous every url is 'added' (first crawl)
    policy    parse_robots + robots_allowed over the current url space
              (--robots gives (host, robots_txt) bodies; without it
              every url is allowed) — disallowed urls leave the
              frontier here; deleted urls never enter it (they are
              absent from the current snapshot by construction)
    schedule  recrawl_schedule: AIMD next-interval per url from
              --history (url, changed_flags) when given, else from this
              round's delta (changed -> [1], unchanged -> [0],
              added -> [] i.e. base interval)
    frontier  frontier_waves over the surviving urls (skew-safe
              per-host politeness cap) joined with the schedule:
              (url, host, wave, next_interval)

Outputs under --output (Iceberg-layout tables, see icetable.py):
    delta/  allowed/  schedule/  frontier/  _lineage/

Stage resume follows curate_corpus exactly: each stage appends a
lineage record carrying the run inputs' content fingerprint after its
table commits; re-running skips stages whose lineage shows an ok
record for the same fingerprint, and ``--no-resume`` forces a rebuild.
The fingerprint covers ALL FOUR inputs (--input, --previous, --robots,
--history), so changing any side input rebuilds instead of serving the
stale tables.
Every stage is deterministic (portable-hash buckets, no sampling), so
a resumed or re-run schedule emits bit-identical waves — the property
that makes the frontier safely restartable mid-crawl.
"""

from __future__ import annotations

import argparse
import sys
import time
import uuid
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _digested(df, url_col: str, text_col: str):
    cols = dict(df.dtypes)
    if text_col in cols:
        body = F.col(text_col)
    elif "html" in cols:
        body = F.col("html").cast("string")
    else:
        body = F.lit("")
    return df.select(
        F.col(url_col).alias("url"), F.md5(body).alias("digest")
    )


def run_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    previous_path: str | None = None,
    robots_path: str | None = None,
    history_path: str | None = None,
    resume: bool = True,
    agent: str = "*",
    per_host_cap: int = 50,
    base_interval: int = 4000,
    min_interval: int = 1000,
    max_interval: int = 16000,
    url_col: str = "url",
    text_col: str = "text",
) -> dict:
    from deduce_spark.spark.iceberg_catalog import open_table
    from deduce_spark.spark.lineage import (
        LineageLog,
        content_fingerprint,
        stage_done,
        stage_record,
    )
    from deduce_spark.spark.weburl import (
        crawl_delta,
        frontier_waves,
        parse_robots,
        recrawl_schedule,
        robots_allowed,
    )

    out = Path(output_path)
    out.mkdir(parents=True, exist_ok=True)
    log = LineageLog(out / "_lineage")
    run_id = uuid.uuid4().hex[:12]
    current = _digested(spark.read.parquet(input_path), url_col, text_col)
    prev = (
        _digested(spark.read.parquet(previous_path), url_col, text_col)
        if previous_path is not None else None
    )
    robots = (
        spark.read.parquet(robots_path) if robots_path is not None else None
    )
    history = (
        spark.read.parquet(history_path).select(
            F.col(url_col).alias("url"), "changed_flags"
        )
        if history_path is not None else None
    )
    # the resume key covers EVERY input that shapes the outputs — a
    # re-run with the same --input but a different --previous/--robots/
    # --history must rebuild, not serve the stale tables
    fp = "+".join(
        [
            content_fingerprint(current, "url", "digest"),
            "prev:" + (content_fingerprint(prev, "url", "digest")
                       if prev is not None else "none"),
            "robots:" + (content_fingerprint(robots, "host", "robots_txt")
                         if robots is not None else "none"),
            "hist:" + (content_fingerprint(history, "url", "changed_flags")
                       if history is not None else "none"),
        ]
    )
    summary: dict = {"run_id": run_id, "input_fp": fp, "stages": {}}

    def stage(name: str, build, table_name: str):
        table = open_table(spark, str(out / table_name))
        if resume and stage_done(log, table, name, fp):
            summary["stages"][name] = {"skipped": True}
            return table.read(spark)
        t0 = time.time()
        df = build()
        table.write(df)
        result = table.read(spark)
        rows = result.count()
        log.append([
            stage_record(
                name, log.next_seq(), run_id, rows,
                time.time() - t0, input_fp=fp,
            )
        ])
        summary["stages"][name] = {"rows": rows,
                                   "wall_s": round(time.time() - t0, 2)}
        return result

    def build_delta():
        if prev is None:
            # first crawl: no previous snapshot, everything is new
            return current.select("url", F.lit("added").alias("status"))
        return crawl_delta(prev, current)

    delta = stage("delta", build_delta, "delta")

    def build_allowed():
        # 'deleted' urls are by construction absent from the current
        # snapshot, so the live set IS the current url space; the policy
        # stage only has to filter robots-disallowed urls
        live = current.select("url")
        if robots is None:
            return live.select(
                "url",
                F.lit(1).alias("allowed"),
                F.lit("").alias("rule_prefix"),
            )
        return robots_allowed(
            live, parse_robots(robots), agent=agent
        ).select("url", "allowed", "rule_prefix")

    allowed = stage("policy", build_allowed, "allowed")

    def build_schedule():
        if history is not None:
            hist = history
        else:
            # single-round history synthesized from this delta: a changed
            # page halves its interval, an unchanged one doubles it, a
            # new page starts at the base
            hist = delta.filter(F.col("status") != "deleted").select(
                "url",
                F.when(F.col("status") == "changed",
                       F.array(F.lit(1)))
                .when(F.col("status") == "unchanged",
                      F.array(F.lit(0)))
                .otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
                .alias("changed_flags"),
            )
        return recrawl_schedule(
            hist,
            base_interval=base_interval,
            min_interval=min_interval,
            max_interval=max_interval,
        )

    schedule = stage("schedule", build_schedule, "schedule")

    def build_frontier():
        fetchable = allowed.filter(F.col("allowed") == 1).select("url")
        waves = frontier_waves(fetchable, per_host_cap=per_host_cap)
        return waves.join(
            schedule.select("url", "next_interval"), "url", "left"
        ).select(
            "url", "host", "wave",
            F.coalesce("next_interval", F.lit(base_interval))
            .cast("long").alias("next_interval"),
        )

    stage("frontier", build_frontier, "frontier")
    return summary


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--previous", default=None,
                   help="previous crawl snapshot parquet (enables delta "
                        "statuses; without it every url is 'added')")
    p.add_argument("--robots", default=None,
                   help="parquet of (host, robots_txt) bodies")
    p.add_argument("--history", default=None,
                   help="parquet of (url, changed_flags) fetch histories")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--agent", default="*")
    p.add_argument("--per-host-cap", type=int, default=50)
    p.add_argument("--base-interval", type=int, default=4000)
    p.add_argument("--min-interval", type=int, default=1000)
    p.add_argument("--max-interval", type=int, default=16000)
    p.add_argument("--url-col", default="url")
    p.add_argument("--text-col", default="text")
    args = p.parse_args(argv)
    spark = (
        SparkSession.builder.appName("schedule_crawl")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    try:
        summary = run_job(
            spark, args.input, args.output,
            previous_path=args.previous, robots_path=args.robots,
            history_path=args.history, resume=not args.no_resume,
            agent=args.agent, per_host_cap=args.per_host_cap,
            base_interval=args.base_interval,
            min_interval=args.min_interval,
            max_interval=args.max_interval,
            url_col=args.url_col, text_col=args.text_col,
        )
        print(summary)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
