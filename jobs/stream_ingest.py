"""Incremental page ingestion — the streaming counterpart of build_kg.

    spark-submit --py-files dist/kgspark.zip jobs/stream_ingest.py \\
        --input /data/incoming-pages --output /tmp/kg_stream \\
        --checkpoint /tmp/kg_stream/_ckpt

Drains everything currently in --input (availableNow trigger) into an
Iceberg-layout mentions table partitioned by (batch_id, part_id), exactly
once (see deduce_spark/spark/streaming.py), then exits; re-running picks
up only new files via the Spark checkpoint.  Run jobs/build_kg.py stage B
(or a downstream batch) against the table to refresh nodes/edges.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="directory of page parquet files")
    ap.add_argument("--output", required=True, help="output root (mentions/, _lineage/)")
    ap.add_argument("--checkpoint", required=True, help="stream checkpoint dir")
    ap.add_argument("--n-parts", type=int, default=64)
    ap.add_argument("--lang", default="nl", help="'' disables the lang filter")
    ap.add_argument("--from-text", action="store_true")
    ap.add_argument("--max-files-per-trigger", type=int, default=64)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from deduce_spark.spark.session import get_spark
    from deduce_spark.spark.streaming import stream_pages_to_mentions

    spark = get_spark(master=args.master, app_name="stream_ingest")
    try:
        q = stream_pages_to_mentions(
            spark,
            args.input,
            args.output,
            args.checkpoint,
            n_parts=args.n_parts,
            lang=args.lang or None,
            from_html=not args.from_text,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        q.awaitTermination()
        progress = q.lastProgress or {}
    finally:
        spark.stop()
    print(json.dumps({"last_batch_id": progress.get("batchId"),
                      "sink": progress.get("sink", {}).get("description", "")[:80]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
