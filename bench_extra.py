#!/usr/bin/env python
"""Round-7 optimization measurement harness (bench.py is FROZEN; this file
holds the extra instrumentation the optimization round needs).

Modes:

  --queries [names...]   time each headline query with the SAME methodology
                         as bench.py (df.count(), warmup identical), at
                         $SPARK_GRAFT_SF_DIR, printing per-query seconds.
  --noop [names...]      same but consumed with the noop sink (guide §1.4)
                         so the full row set is computed.
  --plans [names...]     write .explain("formatted") output for each named
                         query to plans/r07/<query>_<tag>.txt
                         (tag from --tag, default "before").
  --stages               per-stage isolation of minhash_dedup_docs /
                         simhash_pairs_docs / embed_topk at the sf dir.

Each query is labeled via setJobDescription for UI readability.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "kg_mentions_by_tag",
    "kg_triples_by_pred",
    "minhash_dedup_docs",
    "embed_topk",
    "word_freq_topk",
    "tpch_q1",
    "tpch_q3ish",
    "events_sessionize",
    "events_asof_purchase",
    "domain_counts_salted",
    "lineitem_percentiles",
    "simhash_pairs_docs",
]


def _spark():
    import __spark_entry__ as entry_mod
    from deduce_spark.spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="bench_extra_r07")
    # identical warmup to bench.py so timings are comparable
    pages = entry_mod._pages_df(spark, SF_DIR)
    pipe = entry_mod._pipeline(spark)
    pipe.annotate_pages(pages.limit(2 * CPUS).repartition(2 * CPUS), lang=None).count()
    from deduce_spark.spark.dedup import minhash_signatures
    from pyspark.sql import functions as _F

    minhash_signatures(
        spark.range(2 * CPUS)
        .repartition(2 * CPUS)
        .select(_F.col("id").alias("doc_id"), _F.lit("warm up text").alias("text"))
    ).count()
    return spark, entry_mod


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_queries(names: list[str], sink: str) -> None:
    spark, entry_mod = _spark()
    qs = {**entry_mod.queries(), **entry_mod.demoted_queries()}
    timings = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r07:{name}")
        t0 = time.time()
        if sink == "noop":
            _noop(qs[name](spark, SF_DIR))
        else:
            qs[name](spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "sink": sink, "queries": timings,
                      "total": round(sum(timings.values()), 3)}))
    spark.stop()


def write_plans(names: list[str], tag: str) -> None:
    spark, entry_mod = _spark()
    qs = {**entry_mod.queries(), **entry_mod.demoted_queries()}
    out_dir = REPO / "plans" / "r07"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote plans/r07/{name}_{tag}.txt")
    spark.stop()


def run_stages() -> None:
    """Per-stage isolation for the three heavy headline queries."""
    from pyspark.sql import functions as F

    spark, entry_mod = _spark()
    t = {}

    def clock(label, fn):
        spark.sparkContext.setJobDescription(f"r07:{label}")
        t0 = time.time()
        fn()
        t[label] = round(time.time() - t0, 3)
        spark.sparkContext.setJobDescription(None)
        print(label, t[label], flush=True)

    docs = entry_mod._docs(spark, SF_DIR)
    from deduce_spark.spark import dedup

    sigs = dedup.minhash_signatures(docs)
    clock("minhash.signatures", lambda: _noop(sigs))
    clock("minhash.full", lambda: dedup.minhash_dedup(docs, threshold=0.5).count())

    ssigs = dedup.simhash_signatures(docs)
    clock("simhash.signatures", lambda: _noop(ssigs))
    clock("simhash.full",
          lambda: dedup.simhash_near_dupes(docs, max_hamming=10).count())

    emb = entry_mod._emb(spark, SF_DIR)
    from deduce_spark.spark import similarity

    clock("embed.scan", lambda: _noop(emb))
    clock("embed_topk.full", lambda: similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=3).count())
    print(json.dumps({"sf_dir": SF_DIR, "stages": t}))
    spark.stop()


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag = "before"
    if "--tag" in sys.argv:
        tag = sys.argv[sys.argv.index("--tag") + 1]
        args = [a for a in args if a != tag]
    names = args or HEADLINE
    if "--plans" in sys.argv:
        write_plans(names, tag)
    elif "--stages" in sys.argv:
        run_stages()
    elif "--noop" in sys.argv:
        run_queries(names, "noop")
    else:
        run_queries(names, "count")
