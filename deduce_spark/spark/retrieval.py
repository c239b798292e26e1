"""Exact-integer BM25 document retrieval (query -> top-k docs).

The classic BM25 ranking function uses float ``ln`` idf and float length
normalization — unportable across engines (libm last-ulp drift breaks a
value-hash gate, SURVEY "integer quantization" discipline).  This module
defines a RATIONAL BM25 variant whose every step is int64 arithmetic, so
Spark and DuckDB produce bit-identical scores:

- idf surrogate: ``idf_milli = min((1000 * N) DIV (df + 1), 10^9)``
  (reciprocal-df in place of ln((N-df+.5)/(df+.5)); same monotonicity —
  ranks rare terms above hot ones — with a clamp that keeps the later
  product inside int64 even at web-corpus N);
- tf/length part: with k1 = 6/5 and b = 3/4, the textbook
  ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` multiplied through by
  ``10*avgdl`` becomes ``22*tf / (10*tf + 3 + 9*dl/avgdl)``; the single
  non-integer term is folded once as ``r = (9 * dl * N) DIV T`` (T =
  total corpus tokens, so N/T = 1/avgdl), then
  ``tf_micro = (22 * tf_c * 1000000) DIV (10*tf_c + 3 + r)`` with
  ``tf_c = min(tf, 32)`` (tf saturates in BM25 anyway; the clamp bounds
  the numerator at ~7*10^8);
- per-term score = ``idf_milli * tf_micro`` (<= ~2*10^15 after clamps),
  summed per document.

Scale shape: ONE corpus scan computes dl and every per-term tf as native
higher-order-function expressions (no explode, no doc_id shuffle — the
per-doc token multiset never leaves its partition); ``stack`` melts the
per-term columns; the only shuffles are the |Q|-row document-frequency
aggregate (broadcast back) and the final TakeOrderedAndProject top-k.
At 100 TB this is scan + two tiny exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IDF_CLAMP = 1_000_000_000


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for ``query_terms`` under exact-integer BM25.

    Returns (doc_id, score, n_terms, dl) ordered by (score DESC, doc_id)
    — a deterministic total order.  Documents matching no query term are
    absent (standard inverted-index retrieval semantics)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")

    words = F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))

    # NB: the predicate must be a ONE-argument lambda — a second parameter
    # (even defaulted) makes pyspark pass the (element, index) form
    def _eq(term: str):
        return lambda x: x == F.lit(term)

    per_doc = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("dl"),
        *[
            F.size(F.filter(words, _eq(t))).cast("long").alias(f"_tf{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    stack = ", ".join(
        f"'{t}', _tf{i}" for i, t in enumerate(query_terms)
    )
    tf = per_doc.select(
        "doc_id",
        F.col("dl").cast("long").alias("dl"),
        F.expr(f"stack({len(query_terms)}, {stack}) AS (w, tf)"),
    ).filter(F.col("tf") > 0)

    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
    )
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(stats))
        .withColumn("r", F.expr("(9 * dl * n_docs) DIV total_tokens"))
        .withColumn("tf_c", F.least(F.col("tf"), F.lit(32)))
        .withColumn(
            "tf_micro",
            F.expr("(22 * tf_c * 1000000) DIV (10 * tf_c + 3 + r)"),
        )
        .withColumn(
            "idf_milli",
            F.least(
                F.expr("(1000 * n_docs) DIV (df + 1)"), F.lit(IDF_CLAMP)
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum(F.expr("idf_milli * tf_micro")).alias("score"),
            F.count(F.lit(1)).alias("n_terms"),
            F.first("dl").alias("dl"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 20,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical integer arithmetic
    (DuckDB ``//`` == Spark ``DIV`` on non-negative operands)."""
    def tf_expr(t: str) -> str:
        lit = t.replace("'", "''")
        return (
            f"len(list_filter(string_split({text_col}, ' '), "
            f"x -> x = '{lit}'))::BIGINT"
        )

    arms = " UNION ALL ".join(
        f"SELECT doc_id, dl, '{t.replace(chr(39), chr(39) * 2)}' AS w, "
        f"tf{i} AS tf FROM base"
        for i, t in enumerate(query_terms)
    )
    tf_cols = ", ".join(
        f"{tf_expr(t)} AS tf{i}" for i, t in enumerate(query_terms)
    )
    return f"""
        WITH base AS (
            SELECT {id_col} AS doc_id,
                   len(list_filter(string_split({text_col}, ' '),
                       x -> x <> ''))::BIGINT AS dl,
                   {tf_cols}
            FROM {table}
        ),
        tf AS (SELECT * FROM ({arms}) WHERE tf > 0),
        dfreq AS (SELECT w, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1),
        stats AS (SELECT COUNT(*)::BIGINT AS n_docs,
                         SUM(dl)::BIGINT AS total_tokens FROM base),
        scored AS (
            SELECT doc_id, dl,
                   LEAST((1000 * n_docs) // (df + 1),
                         {IDF_CLAMP}::BIGINT)
                   * ((22 * LEAST(tf, 32) * 1000000)
                      // (10 * LEAST(tf, 32) + 3
                          + (9 * dl * n_docs) // total_tokens))
                   AS term_score
            FROM tf JOIN dfreq USING (w) CROSS JOIN stats
        )
        SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS score,
               CAST(COUNT(*) AS BIGINT) AS n_terms,
               CAST(MIN(dl) AS BIGINT) AS dl
        FROM scored GROUP BY doc_id
        ORDER BY score DESC, doc_id LIMIT {k}
    """
