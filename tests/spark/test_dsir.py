"""DSIR importance resampling: Spark vs DuckDB parity, selection
determinism, model-broadcast flag, and the empty-target guard."""

import duckdb
import pytest
from pyspark.sql import functions as F

from deduce_spark.spark.dsir import (
    dsir_select,
    dsir_select_oracle_sql,
    dsir_weights,
    dsir_weights_oracle_sql,
)

SF = "/root/testdata/sf0.001"
DOCS_SQL = "SELECT doc_id, text FROM documents"
TGT_SQL = "SELECT text FROM documents WHERE doc_id % 5 = 0"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{SF}/documents.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_weights_match_oracle(spark, duck, docs):
    got = (
        dsir_weights(docs, docs.filter(F.col("doc_id") % 5 == 0))
        .toPandas()
    )
    want = duck.sql(dsir_weights_oracle_sql(DOCS_SQL, TGT_SQL)).df()
    assert len(got) == len(want) > 0
    assert got.astype("int64").equals(want.astype("int64"))


def test_target_like_docs_rank_highest(spark):
    """On a bimodal corpus (wiki-ish vs spam-ish vocabularies) with a
    wiki-ish target slice, selection must rank every wiki-ish doc above
    every spam-ish doc — the separation property DSIR rests on."""
    wiki = [
        (i, "the quick study of natural language models " * 3)
        for i in range(10)
    ]
    spam = [
        (i + 10, "buy cheap pills now click here winner prize " * 3)
        for i in range(10)
    ]
    docs = spark.createDataFrame(wiki + spam, "doc_id long, text string")
    tgt = docs.filter(F.col("doc_id") < 3)
    top = dsir_select(docs, tgt, 10).toPandas()
    assert sorted(top.doc_id) == list(range(10))


def test_target_slice_enriched_on_uniform_corpus(spark, docs):
    """Even on the single-distribution synthetic corpus, the target
    slice's own docs must be enriched well above the 20% base rate in
    the top of the ranking (they carry p_target's feature mass)."""
    top = dsir_select(docs, docs.filter(F.col("doc_id") % 5 == 0), 25)
    ids = [r.doc_id for r in top.collect()]
    in_target = sum(1 for i in ids if i % 5 == 0)
    assert in_target >= 10, f"only {in_target}/25 top docs are target docs"


def test_select_matches_oracle_and_is_deterministic(spark, duck, docs):
    tgt = docs.filter(F.col("doc_id") % 5 == 0)
    a = dsir_select(docs, tgt, 10).toPandas()
    b = dsir_select(docs, tgt, 10).toPandas()
    want = duck.sql(dsir_select_oracle_sql(DOCS_SQL, TGT_SQL, 10)).df()
    assert a.astype("int64").equals(b.astype("int64"))
    assert a.astype("int64").equals(want.astype("int64"))


def test_broadcast_flag_changes_plan_not_values(spark, docs):
    tgt = docs.filter(F.col("doc_id") % 5 == 0)
    on = dsir_weights(docs, tgt, broadcast_model=True)
    off = dsir_weights(docs, tgt, broadcast_model=False)
    assert on.toPandas().equals(off.toPandas())
    # flag off: the model joins must not carry an explicit broadcast
    # hint (the totals 1-row cross join legitimately keeps one)
    plan_off = off._jdf.queryExecution().optimizedPlan().toString()
    # two model joins + one totals hint when on; only totals when off
    plan_on = on._jdf.queryExecution().optimizedPlan().toString()
    assert plan_on.count("UnresolvedHint") + plan_on.count(
        "ResolvedHint"
    ) >= plan_off.count("UnresolvedHint") + plan_off.count("ResolvedHint")


def test_empty_target_raises(spark):
    empty = spark.createDataFrame([("x",)], "text string").filter(
        F.length("text") > 99
    )
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="target slice"):
        dsir_weights(docs, empty)


def test_short_docs_contribute_nothing(spark):
    """< 2 tokens => no bigram features => absent from the output (the
    lmscore convention, mirrored by the oracle's empty range)."""
    docs = spark.createDataFrame(
        [(1, "one"), (2, "two words here"), (3, "")],
        "doc_id long, text string",
    )
    out = dsir_weights(docs, docs).toPandas()
    assert list(out.doc_id) == [2]
