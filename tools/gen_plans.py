"""Regenerate BENCH/PLANS.md: per-driver-query physical-plan inventory.

Usage: python tools/gen_plans.py   (from the repo root)

For every queries() entry (at sf0.001): count shuffle exchanges, broadcast
joins, Arrow-batched Python stages (MapInPandas / ArrowEvalPython — the
only Python allowed in plans), whether a parquet scan carries pushed
filters, and row-at-a-time Python stages (must be 0 everywhere; the
pytest plan audit enforces the same invariant).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.001"


def main() -> None:
    import __spark_entry__ as entry_mod
    from deduce_spark.spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="gen_plans")
    rows = []
    for name, fn in sorted(
        {**entry_mod.queries(), **entry_mod.demoted_queries()}.items()
    ):
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        rows.append(
            (
                name,
                # shuffle exchanges only: ShuffleExchangeExec prints as
                # "Exchange hashpartitioning/rangepartitioning/
                # SinglePartition..." — a bare plan.count("Exchange") would
                # also count BroadcastExchange/ReusedExchange (no shuffle)
                len(
                    re.findall(
                        r"\bExchange (?:hashpartitioning|rangepartitioning|"
                        r"SinglePartition|RoundRobinPartitioning)",
                        plan,
                    )
                ),
                len(re.findall(r"Broadcast(Hash|NestedLoop)Join", plan)),
                plan.count("MapInPandas") + plan.count("ArrowEvalPython"),
                "yes" if re.search(r"PushedFilters: \[[^\]]", plan) else "-",
                plan.count("BatchEvalPython"),
            )
        )
    out = REPO / "BENCH" / "PLANS.md"
    lines = [
        "# Physical-plan inventory (generated; sf0.001 plans)",
        "",
        "Regenerate with `python tools/gen_plans.py`.",
        "",
        "Per driver query: shuffle exchanges, broadcast joins, Arrow-batched",
        "Python stages (MapInPandas/ArrowEval — the only Python allowed),",
        "parquet filter pushdown, and row-at-a-time Python stages (must be 0).",
        "",
        "| query | exchanges | broadcasts | arrow stages | pushdown | row-python |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append("| " + " | ".join(str(x) for x in r) + " |")
    n_bad = sum(r[5] for r in rows)
    lines += [
        "",
        f"{len(rows)} queries; total row-at-a-time Python stages: {n_bad}.",
        "",
    ]
    out.write_text("\n".join(lines))
    print(f"wrote {out} ({len(rows)} queries, row-python total {n_bad})")
    spark.stop()


if __name__ == "__main__":
    main()
