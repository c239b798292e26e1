"""Table maintenance job — the spark-submit entry for keeping the KG's
Iceberg-layout tables healthy between build runs.

    spark-submit --py-files dist/kgspark.zip jobs/maintain_kg.py \\
        --root /tmp/kg --tables mentions,nodes,edges \\
        --compact --max-files 4 --expire-keep 2

Operations (each optional, applied in this order per table):
  --compact      rewrite partitions with more than --max-files files into
                 one file each (icetable.compact; new snapshot, time
                 travel intact until expiry)
  --expire-keep N  drop all but the last N snapshots and GC unreferenced
                 partition dirs (icetable.expire_snapshots)

Every operation appends a lineage row, so the maintenance history is
auditable next to the build history.  Idempotent: re-running compacts
nothing and expires nothing new.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path


def run_maintenance(
    spark,
    root: str,
    tables: list[str],
    compact: bool = False,
    max_files: int = 4,
    expire_keep: int = 0,
) -> dict:
    from deduce_spark.spark import lineage as lin
    from deduce_spark.spark.iceberg_catalog import open_table

    out = Path(root)
    log = lin.LineageLog(out / "_lineage")
    report: dict = {}
    for name in tables:
        t = open_table(spark, str(out / name))
        if not t.exists():
            report[name] = {"skipped": "missing"}
            continue
        entry: dict = {}
        if compact:
            t0 = time.monotonic()
            entry["compact"] = t.compact(spark, max_files_per_partition=max_files)
            entry["compact"]["wall_s"] = round(time.monotonic() - t0, 3)
        if expire_keep > 0:
            entry["expire"] = t.expire_snapshots(keep_last=expire_keep)
        report[name] = entry
        log.append(
            [
                {
                    "kind": "maintenance",
                    "seq": log.next_seq(),
                    "table": name,
                    "ops": entry,
                    "status": "ok",
                }
            ]
        )
    return report


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="KG output root (build_kg --output)")
    ap.add_argument("--tables", default="mentions,nodes,edges")
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--max-files", type=int, default=4)
    ap.add_argument("--expire-keep", type=int, default=0)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from deduce_spark.spark.session import get_spark

    spark = get_spark(master=args.master, app_name="maintain_kg")
    report = run_maintenance(
        spark,
        args.root,
        [t.strip() for t in args.tables.split(",") if t.strip()],
        compact=args.compact,
        max_files=args.max_files,
        expire_keep=args.expire_keep,
    )
    print(json.dumps({"maintenance": report}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
