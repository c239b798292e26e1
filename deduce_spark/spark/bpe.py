"""BPE tokenizer training and application (exact, engine-portable).

Byte-pair-encoding merge learning (Sennrich et al. 2016) is the
tokenizer-training step of an LLM data pipeline: repeatedly find the
most frequent adjacent symbol pair in the corpus and fuse it into a new
symbol.  The classic trick makes it web-scale: training operates on the
DISTINCT-WORD vocabulary with counts (Zipf: the vocab is orders of
magnitude smaller than the corpus), so each round is one
pair-explode + map-combinable SUM + a single-row argmax — never a
corpus rescan.

Determinism: the argmax tie-breaks by (count DESC, left ASC,
right ASC), and the merge application is a strict left-to-right greedy
fold (leftmost non-overlapping occurrences fuse: "aaa" + merge (a,a)
-> ["aa","a"]) expressed as a native ``aggregate`` lambda — a pure
function of the input, no UDF, identical in both engines (DuckDB
``list_reduce``; pytest pins Spark == pure-Python reference == twin).

The training loop's per-round argmax is a bounded 1-row collect (the
exact_ntile discipline); the vocab table is localCheckpoint'ed per
round so K rounds don't stack K fold-plans on top of each other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deduce_spark.spark.checkpointing import CheckpointArg, make_checkpointer


def _esc(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _esc_duck(s: str) -> str:
    return s.replace("'", "''")


def _merge_expr(col_expr: str, left: str, right: str) -> str:
    """Spark SQL: fuse leftmost non-overlapping (left, right) pairs in a
    symbol array via a left-to-right aggregate fold."""
    l, r, lr = _esc(left), _esc(right), _esc(left + right)
    return (
        f"aggregate({col_expr}, CAST(array() AS ARRAY<STRING>), "
        f"(acc, x) -> CASE WHEN size(acc) > 0 "
        f"AND element_at(acc, -1) = '{l}' AND x = '{r}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{lr}')) "
        f"ELSE concat(acc, array(x)) END)"
    )


def _merge_sql(col_expr: str, left: str, right: str) -> str:
    """DuckDB twin of :func:`_merge_expr` (list_reduce over
    single-element lists — DuckDB's reduce seeds from the first
    element, so elements are pre-wrapped to keep the accumulator a
    list)."""
    l, r, lr = _esc_duck(left), _esc_duck(right), _esc_duck(left + right)
    return (
        f"list_reduce(list_transform({col_expr}, s -> [s]), (acc, x) -> "
        f"CASE WHEN len(acc) > 0 AND acc[-1] = '{l}' AND x[1] = '{r}' "
        f"THEN list_concat(acc[1:len(acc) - 1], ['{lr}']) "
        f"ELSE list_concat(acc, x) END)"
    )


_CHARS = "regexp_extract_all({col}, '.', 0)"  # Spark needs explicit group 0


def _word_freq(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
    min_count: int = 2,
    checkpoint: CheckpointArg = None,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus; returns
    (rank, left, right, pair_count) in learned order.  Stops early when
    no pair reaches ``min_count``."""
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    cut = make_checkpointer(checkpoint)
    spark = docs.sparkSession
    vocab = cut(
        _word_freq(docs, text_col)
        .select(
            F.expr(_CHARS.format(col="word")).alias("sym"), "n"
        )
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        pairs = (
            vocab.filter(F.expr("size(sym)") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "zip_with(slice(sym, 1, size(sym) - 1),"
                        " slice(sym, 2, size(sym) - 1),"
                        " (a, b) -> struct(a AS l, b AS r))"
                    )
                ).alias("p"),
                "n",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()  # single row by construction
        )
        if not best or best[0]["cnt"] < min_count:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        vocab = cut(vocab.select(
            F.expr(_merge_expr("sym", l, r)).alias("sym"), "n"
        ))
        merges.append((rank, l, r, cnt))
    return spark.createDataFrame(
        merges, "rank long, left string, right string, pair_count long"
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    k: int = 40,
) -> DataFrame:
    """(token, n) — top-``k`` BPE tokens of the corpus after applying
    ``merges`` in order (ties broken by token ASC).  The merge list is
    a FIXED constant (a trained tokenizer being applied), so both
    engines replay the identical fold chain."""
    sym = _CHARS.format(col="word")
    for l, r in merges:
        sym = _merge_expr(sym, l, r)
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .select(F.explode(F.expr(sym)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def bpe_token_counts_oracle_sql(
    merges: list[tuple[str, str]],
    table: str = "documents",
    text_col: str = "text",
    k: int = 40,
) -> str:
    """DuckDB twin of :func:`bpe_token_counts`."""
    sym = f"regexp_extract_all(word, '.')"
    for l, r in merges:
        sym = _merge_sql(sym, l, r)
    return f"""
        SELECT token, COUNT(*)::BIGINT AS n
        FROM (
            SELECT unnest({sym}) AS token
            FROM (
                SELECT unnest(regexp_split_to_array({text_col}, '\\s+'))
                    AS word
                FROM {table}
            )
            WHERE word <> ''
        )
        GROUP BY token ORDER BY n DESC, token LIMIT {k}
    """
