"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: native higher-order functions (zip_with +
  aggregate) — JVM-side, no Python; broadcast the (small) query side;
- LSH-bucketed variant: signed random hyperplane projections (seeded numpy
  pandas UDF) -> bucket join -> exact rerank within buckets.  At 100 TB the
  brute force is the per-bucket rerank; the bucketing bounds the join.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_PLANES = 16
_HP_RNG = np.random.RandomState(1234)


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For every query vector, the k nearest vectors by cosine similarity
    (self-matches excluded).  Queries are broadcast; the big side streams."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("qvec"), F.col("nvec"))
            / (_norm(F.col("qvec")) * _norm(F.col("nvec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                F.round("cosine", 6).alias("cosine"))
    )


_BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("table_idx", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
    ]
)


def hyperplane_buckets(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    dim: int = 64, n_planes: int = 4, n_tables: int = 8,
) -> DataFrame:
    """Multi-table sign-of-projection LSH: one (table_idx, bucket) row per
    table per vector.  Recall for neighbors at angle θ is
    1-(1-p^b)^L with p = 1-θ/π, b = n_planes, L = n_tables — tune b up for
    precision (smaller buckets), L up for recall."""
    planes = _HP_RNG.standard_normal((n_tables, n_planes, dim)).astype(np.float32)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            mat = np.vstack([np.asarray(v, dtype=np.float32) for v in batch[vec_col]])
            ids = batch[id_col].astype("int64")
            out_ids, out_tables, out_buckets = [], [], []
            for t in range(n_tables):
                signs = (mat @ planes[t].T) > 0
                buckets = signs @ weights
                out_ids.append(ids)
                out_tables.append(np.full(len(ids), t, dtype=np.int32))
                out_buckets.append(buckets.astype(np.int64))
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_ids),
                    "table_idx": np.concatenate(out_tables),
                    "bucket": np.concatenate(out_buckets),
                }
            )

    return vectors.select(id_col, vec_col).mapInPandas(run, schema=_BUCKET_SCHEMA)


def lsh_topk(
    vectors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate all-pairs top-k: exact cosine rerank over the union of
    same-bucket candidates from every LSH table."""
    buckets = hyperplane_buckets(vectors, id_col, vec_col, dim, n_planes, n_tables)
    l, r = buckets.alias("l"), buckets.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.table_idx") == F.col("r.table_idx"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") != F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("query_id"),
            F.col("r.vec_id").alias("neighbor_id"),
        )
        .distinct()
    )
    v = vectors.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    scored = (
        cand.join(v.withColumnRenamed("vid", "query_id")
                  .withColumnRenamed("vec", "qvec"), "query_id")
        .join(v.withColumnRenamed("vid", "neighbor_id")
              .withColumnRenamed("vec", "nvec"), "neighbor_id")
        .withColumn(
            "cosine",
            _dot(F.col("qvec"), F.col("nvec"))
            / (_norm(F.col("qvec")) * _norm(F.col("nvec"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )
