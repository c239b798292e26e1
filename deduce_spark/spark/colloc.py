"""PMI collocation mining over a document corpus, exact integers.

Pointwise mutual information ranks adjacent word pairs that co-occur
far more than chance — the classic collocation / multi-word-expression
signal (Church & Hanks 1990), used in curation to spot boilerplate
phrases and template n-grams that unigram statistics miss.

    pmi(a, b) = log2( P(ab) / (P(a) P(b)) )
              = log2 c_ab + 2 log2 N_tok - log2 N_big - log2 c_a - log2 c_b

with P(ab) over bigram occurrences (N_big) and P(a) over token
occurrences (N_tok).  Each log2 term is the Q10 fixed-point integer
``plog2`` shared with lmscore.py (monotone, <= 0.086-bit error per
term, bit-identical in Spark and DuckDB) — the per-term sum is an
approximation of the real PMI within ~0.43 bit, but EXACTLY the same
integer in both engines, so the oracle compare is value-exact.  The
term sum (not plog2 of products) also keeps every argument a raw
count: no ``c_ab * N`` product, no int64 overflow at web scale.

Scale shape: one bigram explode + two map-combinable groupBys (both
collapse to vocabulary-sized tables long before the shuffle), two
unhinted joins of the pair table to the unigram table (Catalyst
broadcasts while the vocab is small), 1-row totals cross-joined, and a
TakeOrderedAndProject top-k.  No Python anywhere.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduce_spark.spark.lmscore import (
    _bigrams,
    _plog2_duck,
    _plog2_spark,
    _WORDS,
)


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    top_k: int = 20,
    text_col: str = "text",
    checkpoint=None,
) -> DataFrame:
    """Top-``top_k`` collocations ``(w1, w2, n_pair, pmi_q10)`` among
    bigrams occurring at least ``min_count`` times, ordered by
    ``pmi_q10`` desc then (w1, w2) — the deterministic tie order both
    engines replay.  ``checkpoint`` selects the lineage-cut strategy
    (checkpointing.make_checkpointer: None → localCheckpoint, a dir →
    reliable checkpoint, a callable → custom)."""
    from deduce_spark.spark.checkpointing import make_checkpointer

    cut = make_checkpointer(checkpoint)
    w = _WORDS.format(col=text_col)
    # Each aggregate feeds multiple consumers (pairs filter + n_big;
    # unigram joins on w1 AND w2 + n_tok) and Spark replays a repeated
    # subplan per consumer — each replay a full corpus explode.  The
    # eager lineage cut (the webgraph per-round discipline) bounds the
    # corpus explodes at exactly TWO; both cut tables are
    # vocabulary-sized, so the checkpoint cost is trivial.
    pairs_all = cut(
        _bigrams(docs, text_col, [])
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
    )
    pairs = pairs_all.filter(F.col("n_pair") >= min_count)
    uni = cut(
        docs.select(F.explode(F.expr(w)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n_word"))
    )
    # totals derive from the vocabulary-sized aggregates (sum of unigram
    # counts = token occurrences; sum of pre-filter pair counts = bigram
    # occurrences) — never from extra corpus scans
    totals = uni.agg(
        F.sum("n_word").cast("long").alias("n_tok")
    ).crossJoin(
        pairs_all.agg(F.sum("n_pair").cast("long").alias("n_big"))
    )
    scored = (
        pairs.join(uni.withColumnRenamed("word", "w1"), "w1")
        .withColumnRenamed("n_word", "n_w1")
        .join(uni.withColumnRenamed("word", "w2"), "w2")
        .withColumnRenamed("n_word", "n_w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pair",
            (
                F.expr(_plog2_spark("n_pair"))
                + 2 * F.expr(_plog2_spark("n_tok"))
                - F.expr(_plog2_spark("n_big"))
                - F.expr(_plog2_spark("n_w1"))
                - F.expr(_plog2_spark("n_w2"))
            ).cast("long").alias("pmi_q10"),
        )
    )
    return scored.orderBy(
        F.desc("pmi_q10"), F.asc("w1"), F.asc("w2")
    ).limit(top_k)


def pmi_collocations_oracle_sql(
    docs_sql: str,
    min_count: int = 5,
    top_k: int = 20,
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`pmi_collocations` (same Q10 integers)."""
    words = (
        f"list_filter(string_split({text_col}, ' '), x -> x <> '')"
    )
    return f"""
        WITH docs AS ({docs_sql}),
        toks AS (
            SELECT unnest({words}) AS word FROM docs
        ),
        bigs AS (
            SELECT w[i] AS w1, w[i + 1] AS w2
            FROM (SELECT {words} AS w FROM docs),
                 LATERAL unnest(range(1, len(w))) t(i)
        ),
        pairs AS (
            SELECT w1, w2, COUNT(*)::BIGINT AS n_pair
            FROM bigs GROUP BY w1, w2
            HAVING COUNT(*) >= {min_count}
        ),
        uni AS (
            SELECT word, COUNT(*)::BIGINT AS n_word FROM toks GROUP BY word
        ),
        tot AS (
            SELECT (SELECT COUNT(*)::BIGINT FROM toks) AS n_tok,
                   (SELECT COUNT(*)::BIGINT FROM bigs) AS n_big
        )
        SELECT w1, w2, n_pair,
               ({_plog2_duck("n_pair")}
                + 2 * {_plog2_duck("n_tok")}
                - {_plog2_duck("n_big")}
                - {_plog2_duck("u1.n_word")}
                - {_plog2_duck("u2.n_word")})::BIGINT AS pmi_q10
        FROM pairs
        JOIN uni u1 ON pairs.w1 = u1.word
        JOIN uni u2 ON pairs.w2 = u2.word
        CROSS JOIN tot
        ORDER BY pmi_q10 DESC, w1 ASC, w2 ASC
        LIMIT {top_k}
    """
