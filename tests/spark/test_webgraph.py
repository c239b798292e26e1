"""Integer-quantized HITS: semantics + DuckDB twin parity."""

import duckdb
import pytest

from deduce_spark.spark.webgraph import hits_oracle_sql, hits_scores


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


class TestHITS:
    def test_hub_and_authority_structure(self, spark):
        # h1,h2,h3 all point at "star"; h1 additionally points at a, b.
        # star must be the max authority; h1 the max hub.
        pairs = [
            ("h1", "star"), ("h2", "star"), ("h3", "star"),
            ("h1", "a"), ("h1", "b"),
        ]
        got = {
            r["node"]: (r["auth"], r["hub"])
            for r in hits_scores(_edges(spark, pairs), iters=2).collect()
        }
        assert got["star"][0] == 1000  # max-normalized authority
        assert got["h1"][1] == 1000  # max-normalized hub
        assert got["h2"][1] < 1000 and got["h3"][1] < 1000
        assert got["a"][0] < got["star"][0]
        # sources have no in-edges, sinks no out-edges
        assert got["h2"][0] == 0 and got["star"][1] == 0

    def test_duplicate_edges_collapse(self, spark):
        once = hits_scores(
            _edges(spark, [("x", "y"), ("x", "z")]), iters=2
        ).collect()
        dup = hits_scores(
            _edges(spark, [("x", "y"), ("x", "y"), ("x", "z")]), iters=2
        ).collect()
        assert sorted(map(tuple, once)) == sorted(map(tuple, dup))

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            hits_scores(_edges(spark, [("x", "y")]), iters=0)
        with pytest.raises(ValueError):
            hits_oracle_sql("SELECT 1 src, 2 dst", iters=0)

    def test_twin_parity(self, spark):
        # ring + chords, 3 iterations — every quantized half-step must
        # agree bit-for-bit between engines
        pairs = [(f"n{i}", f"n{(i + 1) % 7}") for i in range(7)]
        pairs += [("n0", "n3"), ("n5", "n2"), ("n1", "n4"), ("n6", "n0")]
        got = sorted(
            map(tuple, hits_scores(_edges(spark, pairs), iters=3).collect())
        )
        duck = duckdb.connect()
        duck.execute("CREATE TABLE edges(src VARCHAR, dst VARCHAR)")
        duck.executemany("INSERT INTO edges VALUES (?, ?)", pairs)
        twin = sorted(
            map(
                tuple,
                duck.sql(
                    hits_oracle_sql("SELECT src, dst FROM edges", iters=3)
                ).fetchall(),
            )
        )
        assert got == twin
