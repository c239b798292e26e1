"""Run the reference regression corpus through the SPARK path.

The kernel tests (tests/regression/) prove the pure-Python semantics match
the reference's golden annotations.  This module proves the *distributed*
path — Arrow batching, mapInPandas, schema, explode — preserves them
bit-for-bit, and turns the result into the explicit mention-level
precision/recall figure the north_rule grades (P/R >= 0.95 vs reference).

Corpus: /root/reference/tests/data/regression_cases/*.json (9 groups,
463 examples), loaded as DATA from the read-only checkout.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

CASES_DIR = Path("/root/reference/tests/data/regression_cases")

GROUPS = {
    "names.json": "names",
    "locations.json": "locations",
    "institutions.json": "institutions",
    "dates.json": "dates",
    "ages.json": "ages",
    "identifiers.json": "identifiers",
    "phone_numbers.json": "phone_numbers",
    "emails.json": "email_addresses",
    "urls.json": "urls",
}


def load_cases(fname: str) -> list[dict]:
    with open(CASES_DIR / fname, "rb") as fh:
        return json.load(fh)["examples"]


def spark_group_mentions(spark: SparkSession, pipe, fname: str):
    """Annotate one group's examples via the Spark pipeline; returns
    (case_id, text, start_char, end_char, tag) rows."""
    examples = load_cases(fname)
    group = GROUPS[fname]
    enabled = pipe_engine_members(pipe, group)
    df = spark.createDataFrame(
        [(str(e["id"]), e["text"]) for e in examples], "url string, text string"
    ).withColumn("warc_ts", F.lit(None).cast("timestamp")).withColumn(
        "lang", F.lit("nl")
    )
    annotated = pipe.annotate_pages(
        df, lang=None, from_html=False, with_redacted=False, with_text=False,
        enabled=enabled,
    )
    return (
        pipe.mentions_long(annotated)
        .select(
            F.col("url").alias("case_id"), "text", "start_char", "end_char", "tag"
        )
        .collect()
    )


def pipe_engine_members(pipe, group: str) -> set[str]:
    engine = pipe._engine_bc.value
    return engine.group_members(group)


def corpus_pr(spark: SparkSession, pipe) -> dict:
    """Mention-level P/R of the Spark path vs the golden corpus."""
    tp = fp = fn = 0
    exact_cases = total_cases = 0
    per_group: dict[str, dict] = {}
    for fname in sorted(GROUPS):
        golden_by_case: dict[str, set] = {}
        for e in load_cases(fname):
            golden_by_case[str(e["id"])] = {
                (a["text"], a["start_char"], a["end_char"], a["tag"])
                for a in e["annotations"]
            }
        got_by_case: dict[str, set] = {cid: set() for cid in golden_by_case}
        for r in spark_group_mentions(spark, pipe, fname):
            got_by_case.setdefault(r.case_id, set()).add(
                (r.text, r.start_char, r.end_char, r.tag)
            )
        g_tp = g_fp = g_fn = 0
        g_exact = 0
        for cid, golden in golden_by_case.items():
            got = got_by_case.get(cid, set())
            g_tp += len(got & golden)
            g_fp += len(got - golden)
            g_fn += len(golden - got)
            g_exact += got == golden
        tp, fp, fn = tp + g_tp, fp + g_fp, fn + g_fn
        exact_cases += g_exact
        total_cases += len(golden_by_case)
        per_group[fname.removesuffix(".json")] = {
            "cases": len(golden_by_case),
            "exact": g_exact,
            "tp": g_tp,
            "fp": g_fp,
            "fn": g_fn,
        }
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    return {
        "precision": round(precision, 4),
        "recall": round(recall, 4),
        "exact_cases": exact_cases,
        "total_cases": total_cases,
        "per_group": per_group,
    }
