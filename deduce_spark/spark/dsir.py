"""DSIR-style data selection via importance resampling (exact integer).

DSIR (Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023) picks pretraining documents whose hashed
n-gram feature distribution looks like a small trusted TARGET corpus
rather than the RAW crawl: fit bag-of-hashed-ngram models p_target and
p_raw, weight every raw document by log p_target(doc) - log p_raw(doc),
and resample proportionally.  The hashing step is what makes it scale —
the "vocabulary" is a FIXED number of buckets, so both models are
bounded-size tables no matter how large the corpora are.

Engine-portable integer arithmetic (the repo-wide oracle discipline):

- feature: each word bigram hashes to ``bucket = md5_32(w1 ' ' w2) %
  n_buckets`` — md5 exists in both engines and the 32-bit hex prefix
  parses to the same non-negative int64 either side;
- models: add-one-smoothed bucket counts ``t_b`` (target) and ``r_b``
  (raw) with totals ``T``/``R`` — per-occurrence importance weight in
  Q10 fixed-point bits (``plog2`` as in lmscore.py: exact integer part,
  linearly interpolated mantissa, strictly monotone):

    w(b) = [plog2(t_b + 1) - plog2(T + B)] - [plog2(r_b + 1) - plog2(R + B)]

- per-doc weight = sum of w(b) over the doc's feature OCCURRENCES;
  positive = target-like.  Real DSIR adds Gumbel noise before taking
  the top-k; this implementation is the deterministic MAP variant
  (top-k by weight) so the result is reproducible and value-hashable —
  a caller wanting sampled selection can add hash-derived noise to
  ``weight_q10`` upstream of :func:`dsir_select`'s ordering.

Scale shape (100 TB raw corpus, few-GB target):
- both model tables aggregate to <= ``n_buckets`` rows (map-side
  combinable counts), so they BROADCAST regardless of corpus size —
  ``broadcast_model=False`` is provided for symmetry with
  lmscore.bigram_lm_score but should never be needed;
- the per-doc pass is narrow (split -> zip_with bigrams -> md5 ->
  groupBy (doc, bucket)) followed by one broadcast join and one
  groupBy(doc) — a single shuffle of (doc_id, bucket, n) rows, already
  reduced below the token count;
- totals travel as 1-row cross-joined aggregates, never a collected
  scalar;
- selection is a global top-k (TakeOrderedAndProject — per-partition
  heaps, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduce_spark.spark.lmscore import _bigrams, _plog2_duck, _plog2_spark

_BUCKET_SPARK = (
    "CAST(conv(substr(md5(concat(w1, ' ', w2)), 1, 8), 16, 10) AS BIGINT)"
)
_BUCKET_DUCK = "('0x' || substr(md5(w1 || ' ' || w2), 1, 8))::BIGINT"


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, keep: list[str]
) -> DataFrame:
    """(keep..., bucket, n) — occurrence counts of hashed-bigram
    features, pre-reduced before any join."""
    return (
        _bigrams(df, text_col, keep)
        .select(*keep, F.expr(f"{_BUCKET_SPARK} % {n_buckets}").alias("bucket"))
        .groupBy(*keep, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def dsir_weights(
    docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    broadcast_model: bool = True,
) -> DataFrame:
    """(doc_id, n_features, weight_q10) for every doc with >= 1 bigram,
    ordered by doc_id.  ``weight_q10`` is the DSIR importance weight
    log2[p_target(doc) / p_raw(doc)] in Q10 fixed-point bits; p_raw is
    fit on ``docs`` itself (the standard DSIR setup: select from the
    raw pool against a trusted target slice)."""
    t_model = (
        _bucket_counts(target_docs, text_col, n_buckets, [])
        .withColumnRenamed("n", "t_b")
    )
    r_model = (
        _bucket_counts(docs, text_col, n_buckets, [])
        .withColumnRenamed("n", "r_b")
    )
    # An empty target slice makes p_target a constant uniform and every
    # weight identical — the ranking silently collapses.  Fail fast
    # (bounded probe on the <= n_buckets-row model table).
    if not t_model.limit(1).count():
        raise ValueError(
            "target slice yields no bigram features (every doc has < 2 "
            "tokens) — the DSIR target model is undefined"
        )
    if broadcast_model:
        t_model, r_model = F.broadcast(t_model), F.broadcast(r_model)
    totals = (
        t_model.agg(F.sum("t_b").cast("long").alias("t_total"))
        .crossJoin(r_model.agg(F.sum("r_b").cast("long").alias("r_total")))
    )

    probe = _bucket_counts(
        docs.select(F.col(id_col).alias("doc_id"), text_col),
        text_col,
        n_buckets,
        ["doc_id"],
    )
    b = n_buckets
    occ_w = (
        f"({_plog2_spark('coalesce(t_b, 0) + 1')}"
        f" - {_plog2_spark(f't_total + {b}')})"
        f" - ({_plog2_spark('coalesce(r_b, 0) + 1')}"
        f" - {_plog2_spark(f'r_total + {b}')})"
    )
    return (
        probe.join(t_model, ["bucket"], "left")
        .join(r_model, ["bucket"], "left")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", "n", F.expr(occ_w).cast("long").alias("w"))
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_features"),
            F.sum(F.col("n") * F.col("w")).cast("long").alias("weight_q10"),
        )
        .orderBy("doc_id")
    )


def dsir_select(
    docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    broadcast_model: bool = True,
) -> DataFrame:
    """The ``k`` most target-like docs: (doc_id, n_features, weight_q10)
    ordered by (weight_q10 DESC, doc_id) — deterministic MAP top-k.

    Global top-k compiles to TakeOrderedAndProject (per-partition heaps
    of size k), so selection cost is one pass over the weight table."""
    w = dsir_weights(
        docs,
        target_docs,
        text_col=text_col,
        id_col=id_col,
        n_buckets=n_buckets,
        broadcast_model=broadcast_model,
    )
    return w.orderBy(F.col("weight_q10").desc(), "doc_id").limit(k)


def dsir_weights_oracle_sql(
    docs_sql: str,
    target_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> str:
    """DuckDB twin of :func:`dsir_weights` — identical md5-prefix bucket
    hash and Q10 plog2 arithmetic (all plog2 inputs are positive, so no
    trunc-vs-floor division divergence is reachable)."""
    words = f"list_filter(string_split({text_col}, ' '), x -> x <> '')"
    b = n_buckets
    occ_w = (
        f"({_plog2_duck('COALESCE(t_b, 0) + 1')}"
        f" - {_plog2_duck(f't_total + {b}')})"
        f" - ({_plog2_duck('COALESCE(r_b, 0) + 1')}"
        f" - {_plog2_duck(f'r_total + {b}')})"
    )
    return f"""
        WITH t_bg AS (
            SELECT w[i] AS w1, w[i + 1] AS w2
            FROM (SELECT {words} AS w FROM ({target_sql})),
                 LATERAL unnest(range(1, len(w))) t(i)
        ),
        t_model AS (
            SELECT {_BUCKET_DUCK} % {b} AS bucket, COUNT(*)::BIGINT AS t_b
            FROM t_bg GROUP BY 1
        ),
        r_bg AS (
            SELECT w[i] AS w1, w[i + 1] AS w2
            FROM (SELECT {words} AS w FROM ({docs_sql})),
                 LATERAL unnest(range(1, len(w))) t(i)
        ),
        r_model AS (
            SELECT {_BUCKET_DUCK} % {b} AS bucket, COUNT(*)::BIGINT AS r_b
            FROM r_bg GROUP BY 1
        ),
        totals AS (
            SELECT (SELECT SUM(t_b)::BIGINT FROM t_model) AS t_total,
                   (SELECT SUM(r_b)::BIGINT FROM r_model) AS r_total
        ),
        probe AS (
            SELECT doc_id, {_BUCKET_DUCK} % {b} AS bucket,
                   COUNT(*)::BIGINT AS n
            FROM (
                SELECT {id_col} AS doc_id, w[i] AS w1, w[i + 1] AS w2
                FROM (SELECT {id_col}, {words} AS w FROM ({docs_sql})),
                     LATERAL unnest(range(1, len(w))) t(i)
            ) GROUP BY 1, 2
        )
        SELECT doc_id, SUM(n)::BIGINT AS n_features,
               SUM(n * ({occ_w}))::BIGINT AS weight_q10
        FROM probe
        LEFT JOIN t_model USING (bucket)
        LEFT JOIN r_model USING (bucket)
        CROSS JOIN totals
        GROUP BY doc_id
        ORDER BY doc_id
    """


def dsir_select_oracle_sql(
    docs_sql: str,
    target_sql: str,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> str:
    """DuckDB twin of :func:`dsir_select`."""
    inner = dsir_weights_oracle_sql(
        docs_sql, target_sql, text_col=text_col, id_col=id_col,
        n_buckets=n_buckets,
    )
    return (
        f"SELECT * FROM ({inner}) "
        f"ORDER BY weight_q10 DESC, doc_id LIMIT {k}"
    )
