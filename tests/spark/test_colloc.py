"""PMI collocations (colloc.py) and crawl_delta (weburl.py)."""
import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deduce_spark.spark.colloc import (
    pmi_collocations,
    pmi_collocations_oracle_sql,
)
from deduce_spark.spark.weburl import crawl_delta, crawl_delta_oracle_sql

DOCS = [
    (1, "new york is big and new york is old"),
    (2, "new york wins again in new york"),
    (3, "the cat and the dog and the cat"),
    (4, "the a the b the c the d the e"),
    (5, "one two"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_collocation_outranks_frequent_pair(spark, docs_df):
    rows = pmi_collocations(docs_df, min_count=2, top_k=10).collect()
    ranks = {(r["w1"], r["w2"]): i for i, r in enumerate(rows)}
    # "new york" always co-occurs (P(york|new)=1) — must outrank
    # "the <x>" pairs whose right side varies
    assert ("new", "york") in ranks
    by_pair = {(r["w1"], r["w2"]): r for r in rows}
    assert by_pair[("new", "york")]["n_pair"] == 4
    the_pairs = [p for p in ranks if p[0] == "the"]
    for p in the_pairs:
        assert by_pair[("new", "york")]["pmi_q10"] > by_pair[p]["pmi_q10"]


def test_min_count_filters(spark, docs_df):
    rows = pmi_collocations(docs_df, min_count=3, top_k=50).collect()
    assert all(r["n_pair"] >= 3 for r in rows)
    assert ("new", "york") in {(r["w1"], r["w2"]) for r in rows}


def test_topk_plan_take_ordered(spark, docs_df):
    plan = (
        pmi_collocations(docs_df, min_count=2, top_k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_pmi_oracle_parity_inline(spark, docs_df):
    got = pmi_collocations(docs_df, min_count=2, top_k=10).toPandas()
    con = duckdb.connect()
    con.register("docs_src", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    want = con.execute(
        pmi_collocations_oracle_sql(
            "SELECT * FROM docs_src", min_count=2, top_k=10
        )
    ).df()
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c


OLD = [("u1", "d1"), ("u2", "d2"), ("u3", "d3")]
NEW = [("u2", "dX"), ("u3", "d3"), ("u4", "d4")]


def test_crawl_delta_statuses(spark):
    old = spark.createDataFrame(OLD, "url string, digest string")
    new = spark.createDataFrame(NEW, "url string, digest string")
    out = {r["url"]: r["status"] for r in crawl_delta(old, new).collect()}
    assert out == {
        "u1": "deleted", "u2": "changed", "u3": "unchanged", "u4": "added",
    }


def test_crawl_delta_oracle_parity(spark):
    old = spark.createDataFrame(OLD, "url string, digest string")
    new = spark.createDataFrame(NEW, "url string, digest string")
    got = crawl_delta(old, new).orderBy("url").toPandas()
    con = duckdb.connect()
    con.register("old_src", pd.DataFrame(OLD, columns=["url", "digest"]))
    con.register("new_src", pd.DataFrame(NEW, columns=["url", "digest"]))
    want = con.execute(
        crawl_delta_oracle_sql(
            "SELECT * FROM old_src", "SELECT * FROM new_src"
        )
        + " ORDER BY url"
    ).df()
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c
