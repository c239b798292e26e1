"""CCNet-style n-gram language-model quality scoring (exact integer).

CCNet (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", 2020) buckets Common-Crawl documents by
the perplexity of a language model trained on a trusted reference
corpus — low-perplexity text reads like the reference, high-perplexity
text is boilerplate/gibberish.  The float ``log`` in a real LM is
unportable across engines (libm last-ulp drift breaks the value-hash
gate), so this module scores with an INTEGER bit-cost surrogate that
Spark and DuckDB reproduce exactly:

- model: add-one-smoothed bigram counts from the reference slice —
  ``c12 = count(w1 w2)``, ``c1 = count(w1 *)`` (bigram starts), and
  ``V = |distinct w1|``;
- per-bigram cost in Q10 fixed-point bits (units of 1/1024 bit):
  ``cost = plog2(c1 + V) - plog2(c12 + 1)`` where
  ``plog2(x) = 1024*i + (1024*x DIV 2^i) - 1024`` with
  ``i = ilog2(x) = length(bin(x)) - 1`` (``bin`` exists in both
  engines; same trick as sketches.hll_registers).  ``plog2`` is the
  classic float-bit-pattern log2 — integer part exact, mantissa
  linearly interpolated (max error 0.086 bits), strictly monotone —
  so the cost is an exact-integer ``-log2 P_addone(w2 | w1)``
  surrogate that is >= 0 (``c1 >= c12`` and ``V >= 1`` imply
  ``c1 + V >= c12 + 1``): unseen bigrams cost ~plog2(c1+V), on-model
  bigrams ~log2((c1+V)/c12);
- per-doc score: ``ppl_millibits = (1000 * sum(cost)) DIV
  (1024 * n_bigrams)`` — mean bits per bigram in milli-bits, the
  integer stand-in for log-perplexity.  Lower = closer to the
  reference distribution.

Scale shape: tokenization and bigram expansion are NARROW (explode of a
zip_with over the already-loaded token array — no pre-join shuffle);
the model build is two map-side-combinable aggregates over the
reference slice; scoring joins the doc-bigram stream against the model
on (w1, w2) and (w1).  The model tables are broadcast by default —
right whenever the reference slice is the curated few-GB corpus CCNet
uses (a 5M-row bigram table is ~100 MB).  For a model too big to
broadcast, pass ``broadcast_model=False`` and the joins become ordinary
shuffled hash joins keyed on the bigram — still one shuffle of the
probe stream, no driver-side state either way (V travels as a 1-row
cross-joined aggregate, never a collected scalar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORDS = "filter(split({col}, ' '), x -> x <> '')"


def _bigrams(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    """One row per bigram OCCURRENCE: ``keep`` columns + (w1, w2).

    Docs with fewer than two tokens contribute nothing (no bigrams —
    standard LM convention, mirrored by the oracle's empty range)."""
    w = _WORDS.format(col=text_col)
    pair = F.explode(
        F.expr(
            f"zip_with(slice({w}, 1, size({w}) - 1),"
            f" slice({w}, 2, size({w}) - 1),"
            " (a, b) -> struct(a AS w1, b AS w2))"
        )
    ).alias("bg")
    return (
        df.filter(F.expr(f"size({w})") >= 2)
        .select(*keep, pair)
        .select(*keep, "bg.w1", "bg.w2")
    )


def bigram_lm_train(
    ref_docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(bigram, unigram) count tables from the reference slice.

    bigram: (w1, w2, c12); unigram: (w1, c1) with
    ``c1 = sum(c12) over w2`` — the add-one denominator's event count.
    Both are map-side-combinable aggregates; at web scale each reduces
    to the vocabulary size long before the shuffle."""
    big = (
        _bigrams(ref_docs, text_col, [])
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    uni = big.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    return big, uni


def bigram_lm_score(
    docs: DataFrame,
    ref_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """(doc_id, n_bigrams, cost_q10, ppl_millibits) for every doc with
    >= 1 bigram, ordered by doc_id.  Lower ``ppl_millibits`` = closer
    to the reference distribution (CCNet "head" bucket)."""
    big, uni = bigram_lm_train(ref_docs, text_col=text_col)
    # An empty reference slice (no doc with >= 2 tokens) gives V = 0 and
    # a constant NEGATIVE cost of -1024 per bigram — every doc would
    # silently score ppl_millibits = -1000 and the ranking collapses.
    # Fail fast instead; the probe is a bounded LIMIT 1 on the (small,
    # already-aggregated) unigram table.
    if not uni.limit(1).count():
        raise ValueError(
            "reference slice yields no bigrams (every doc has < 2 "
            "tokens) — the add-one model is undefined"
        )
    if broadcast_model:
        big, uni = F.broadcast(big), F.broadcast(uni)
    vocab = uni.agg(F.count(F.lit(1)).cast("long").alias("v"))

    probe = _bigrams(
        docs.select(F.col(id_col).alias("doc_id"), text_col), text_col,
        ["doc_id"],
    )
    cost = (
        probe.join(big, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                F.expr(_plog2_spark("coalesce(c1, 0) + v"))
                - F.expr(_plog2_spark("coalesce(c12, 0) + 1"))
            ).cast("long").alias("cost"),
        )
    )
    return (
        cost.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("cost").cast("long").alias("cost_q10"),
        )
        .withColumn(
            "ppl_millibits",
            F.expr("(1000 * cost_q10) DIV (1024 * n_bigrams)"),
        )
        .orderBy("doc_id")
    )


def _plog2_spark(x: str) -> str:
    """Q10 fixed-point log2 of a positive int64 expression (Spark SQL)."""
    il = f"(length(bin({x})) - 1)"
    return (
        f"(1024 * CAST({il} AS BIGINT)"
        f" + (1024 * CAST(({x}) AS BIGINT))"
        f" DIV shiftleft(CAST(1 AS BIGINT), {il}) - 1024)"
    )


def _plog2_duck(x: str) -> str:
    """Q10 fixed-point log2 of a positive int64 expression (DuckDB)."""
    il = f"(length(bin(CAST(({x}) AS BIGINT))) - 1)"
    return (
        f"(1024 * {il}"
        f" + (1024 * CAST(({x}) AS BIGINT))"
        f" // (1::BIGINT << {il}) - 1024)"
    )


def bigram_lm_score_oracle_sql(
    docs_sql: str,
    ref_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bigram_lm_score` — identical integer
    arithmetic (``//`` == Spark ``DIV`` on non-negative operands;
    ``length(bin(x)) - 1`` == floor(log2 x) in both engines)."""
    words = f"list_filter(string_split({text_col}, ' '), x -> x <> '')"
    p_uni = _plog2_duck("COALESCE(c1, 0) + v")
    p_big = _plog2_duck("COALESCE(c12, 0) + 1")
    return f"""
        WITH ref_bg AS (
            SELECT w[i] AS w1, w[i + 1] AS w2
            FROM (SELECT {words} AS w FROM ({ref_sql})),
                 LATERAL unnest(range(1, len(w))) t(i)
        ),
        big AS (SELECT w1, w2, COUNT(*)::BIGINT AS c12
                FROM ref_bg GROUP BY 1, 2),
        uni AS (SELECT w1, SUM(c12)::BIGINT AS c1 FROM big GROUP BY 1),
        vocab AS (SELECT COUNT(*)::BIGINT AS v FROM uni),
        probe AS (
            SELECT {id_col} AS doc_id, w[i] AS w1, w[i + 1] AS w2
            FROM (SELECT {id_col}, {words} AS w FROM ({docs_sql})),
                 LATERAL unnest(range(1, len(w))) t(i)
        ),
        cost AS (
            SELECT doc_id, {p_uni} - {p_big} AS cost
            FROM probe
            LEFT JOIN big USING (w1, w2)
            LEFT JOIN uni USING (w1)
            CROSS JOIN vocab
        )
        SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
               SUM(cost)::BIGINT AS cost_q10,
               (1000 * SUM(cost)::BIGINT) // (1024 * COUNT(*)::BIGINT)
                   AS ppl_millibits
        FROM cost GROUP BY doc_id ORDER BY doc_id
    """
