"""Arrow-vectorized pipeline stages: extract -> annotate -> mentions.

Stage fusion: HTML extraction, tokenization, all annotators, interval
resolution and redaction run inside ONE ``mapInPandas`` pass so token and
mention arrays never cross the JVM<->Python boundary (SURVEY.md §4: one UDF
beats N chained UDFs by avoiding repeated Arrow serialization).  The
per-page phase is embarrassingly parallel — no shuffle — so it scales
linearly with cores, which is what the N vs 4N efficiency criterion
measures.

The kernel Engine is shipped once per executor via ``SparkContext.broadcast``
(~40 MB pickled; unpickled once per reused Python worker).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deduce_spark.kernel.engine import Engine

MENTION_STRUCT = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("start_char", T.IntegerType()),
        T.StructField("end_char", T.IntegerType()),
        T.StructField("tag", T.StringType()),
        T.StructField("priority", T.IntegerType()),
    ]
)

ANNOTATED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("mentions", T.ArrayType(MENTION_STRUCT)),
        T.StructField("redacted_text", T.StringType()),
    ]
)


# Engine cache living in the (reused) Python worker process.  A pyspark
# Broadcast deserializes into a FRESH object per task, so ``bc.value`` would
# re-unpickle the ~40 MB engine for every task; caching by token in a module
# global amortizes it to once per worker process.
_WORKER_ENGINE_CACHE: dict[str, Engine] = {}


def _cached_engine(token: str, bc) -> Engine:
    engine = _WORKER_ENGINE_CACHE.get(token)
    if engine is None:
        engine = bc.value
        _WORKER_ENGINE_CACHE.clear()  # at most one engine per worker
        _WORKER_ENGINE_CACHE[token] = engine
    return engine


class AnnotatePipeline:
    """Holds the broadcast engine and exposes DataFrame -> DataFrame stages."""

    def __init__(self, spark: SparkSession, engine: Optional[Engine] = None) -> None:
        self.spark = spark
        import uuid

        self._token = uuid.uuid4().hex
        self._engine_bc = spark.sparkContext.broadcast(engine or Engine())

    # -- fused per-page stage --------------------------------------------

    def annotate_pages(
        self,
        pages: DataFrame,
        lang: Optional[str] = "nl",
        from_html: bool = True,
        with_redacted: bool = True,
        with_text: bool = True,
        enabled: Optional[set[str]] = None,
        person_col: Optional[str] = None,
    ) -> DataFrame:
        """pages(url, warc_ts, html, text?, lang) -> annotated pages.

        When ``from_html`` is set the text column is (re)derived from the
        html bytes with the kernel extractor — the byte-identical-per-url
        invariant versus the oracle.  The lang filter is a plain column
        predicate, so Catalyst pushes it into the parquet scan.
        ``with_text=False`` / ``with_redacted=False`` drop the wide string
        columns from the output (one third the Arrow traffic when only the
        mention spans are consumed downstream).

        ``person_col``: optional per-page known-entity struct column
        ``struct<first_names:array<string>, initials:string,
        surname:string>`` — the Spark carrier for the reference's
        ``metadata["patient"]`` (A8 PatientNameAnnotator,
        deduce/annotator.py:343-485; generalizes to per-page known
        entities in the KG graft).  Null rows skip A8 exactly like a
        missing metadata dict.
        """
        if lang is not None:
            pages = pages.filter(F.col("lang") == lang)
        cols = ["url", "warc_ts", "lang"] + (["html"] if from_html else ["text"])
        if person_col is not None:
            cols.append(person_col)
        pages = pages.select(*cols)
        # the per-page phase is CPU-bound Python, not IO-bound: parallelism
        # must track cores, not input bytes.  Inputs that scan with at least
        # one partition per core are left alone (no gratuitous shuffle of
        # page bytes); narrower inputs are fanned out to 2 x cores.
        cores = self.spark.sparkContext.defaultParallelism
        # (streaming DataFrames expose no partitioning before execution and
        # micro-batch sizing is the trigger's job — leave them alone)
        if not pages.isStreaming and pages.rdd.getNumPartitions() < cores:
            pages = pages.repartition(2 * cores)
        bc = self._engine_bc
        token = self._token

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            engine = _cached_engine(token, bc)
            from deduce_spark.kernel.doc import Person
            from deduce_spark.kernel.html_text import extract_text

            for batch in batches:
                texts = (
                    [extract_text(h) for h in batch["html"]]
                    if from_html
                    else list(batch["text"])
                )
                if person_col is not None:
                    metadatas = [
                        (
                            {
                                "patient": Person(
                                    first_names=(
                                        list(p["first_names"])
                                        if p["first_names"] is not None
                                        else None
                                    ),
                                    initials=p["initials"],
                                    surname=p["surname"],
                                )
                            }
                            if p is not None
                            else None
                        )
                        for p in batch[person_col]
                    ]
                else:
                    metadatas = [None] * len(texts)
                mentions_col = []
                redacted_col = []
                for text, metadata in zip(texts, metadatas):
                    doc = engine.deidentify(
                        text, metadata=metadata, enabled=enabled
                    )
                    mentions_col.append(
                        [
                            (m.text, m.start, m.end, m.tag, m.priority)
                            for m in sorted(doc.mentions, key=lambda m: m.sort_key())
                        ]
                    )
                    redacted_col.append(
                        doc.metadata.get("redacted_text") if with_redacted else None
                    )
                out = {
                    "url": batch["url"],
                    "warc_ts": batch["warc_ts"],
                    "lang": batch["lang"],
                }
                if with_text:
                    out["text"] = texts
                out["mentions"] = mentions_col
                if with_redacted:
                    out["redacted_text"] = redacted_col
                yield pd.DataFrame(out)

        schema = T.StructType(
            [
                f
                for f in ANNOTATED_SCHEMA.fields
                if (with_text or f.name != "text")
                and (with_redacted or f.name != "redacted_text")
            ]
        )
        return pages.mapInPandas(run, schema=schema)

    # -- long-format mentions --------------------------------------------

    @staticmethod
    def mentions_long(annotated: DataFrame) -> DataFrame:
        """Explode per-page mention arrays to a long mentions table."""
        return annotated.select(
            "url",
            "warc_ts",
            F.explode("mentions").alias("m"),
        ).select(
            "url",
            "warc_ts",
            F.col("m.text").alias("text"),
            F.col("m.start_char").alias("start_char"),
            F.col("m.end_char").alias("end_char"),
            F.col("m.tag").alias("tag"),
            F.col("m.priority").alias("priority"),
        )
