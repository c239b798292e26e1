"""Exact-integer BM25 retrieval: ranking semantics + DuckDB twin parity."""

import duckdb
import pytest

from deduce_spark.spark.retrieval import bm25_oracle_sql, bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBM25:
    def test_rare_term_outranks_hot_term(self, spark):
        # 'zebra' appears in 1/10 docs, 'the' in all 10 — equal tf and dl,
        # so the reciprocal-df idf must rank the zebra doc first
        rows = [(i, "the alpha beta gamma") for i in range(9)]
        rows.append((9, "zebra alpha beta gamma"))
        got = bm25_topk(
            _docs(spark, rows), ["the", "zebra"], k=3
        ).collect()
        assert got[0]["doc_id"] == 9
        assert got[0]["score"] > got[1]["score"]

    def test_tf_saturation_and_length_norm(self, spark):
        # same tf: the SHORTER doc must score higher (length normalization)
        rows = [
            (1, "spark spark " + "pad " * 50),
            (2, "spark spark pad"),
        ]
        got = {
            r["doc_id"]: r["score"]
            for r in bm25_topk(_docs(spark, rows), ["spark"], k=5).collect()
        }
        assert got[2] > got[1]

    def test_no_match_docs_absent_and_k_respected(self, spark):
        rows = [(i, "only filler words") for i in range(5)]
        rows += [(10 + i, "needle filler") for i in range(4)]
        got = bm25_topk(_docs(spark, rows), ["needle"], k=3).collect()
        assert len(got) == 3
        assert all(r["doc_id"] >= 10 for r in got)

    def test_validation(self, spark):
        df = _docs(spark, [(1, "a")])
        with pytest.raises(ValueError):
            bm25_topk(df, [])
        with pytest.raises(ValueError):
            bm25_topk(df, ["a", "a"])

    def test_twin_parity_synthetic(self, spark):
        # quoted term + duplicate-free multiset across skewed lengths
        rows = [
            (i, ("spark " * (i % 4) + "merge " * (i % 3) + "pad " * i).strip())
            for i in range(1, 30)
        ]
        got = [
            tuple(r)
            for r in bm25_topk(
                _docs(spark, rows), ["spark", "merge"], k=10
            ).collect()
        ]
        duck = duckdb.connect()
        duck.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        duck.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        twin = duck.sql(
            bm25_oracle_sql(["spark", "merge"], k=10)
        ).fetchall()
        assert got == [tuple(r) for r in twin]
