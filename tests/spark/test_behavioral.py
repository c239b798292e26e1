"""Funnel + cohort retention: ordering semantics and DuckDB twins."""

import datetime as dt

import duckdb
import pandas as pd
import pytest

from deduce_spark.spark.relational import (
    cohort_retention, cohort_retention_oracle_sql,
    funnel_counts, funnel_oracle_sql,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def _t(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


class TestFunnel:
    def test_strict_time_order_required(self, spark):
        rows = [
            # u1 completes in order; u2 clicks BEFORE viewing; u3 clicks
            # at the exact same second as the view (strict > required)
            (1, "view", _t(10)), (1, "click", _t(20)),
            (2, "click", _t(10)), (2, "view", _t(20)),
            (3, "view", _t(30)), (3, "click", _t(30)),
        ]
        got = {
            r["step"]: r["users"]
            for r in funnel_counts(
                _ev(spark, rows), ["view", "click"]
            ).collect()
        }
        assert got == {"view": 3, "click": 1}

    def test_earliest_completion_semantics(self, spark):
        # u1's SECOND view is followed by a click, but the funnel
        # anchors at the EARLIEST view — the click still qualifies
        # because it is after that earliest view too
        rows = [
            (1, "view", _t(10)), (1, "view", _t(100)),
            (1, "click", _t(150)),
        ]
        got = {
            r["step"]: r["users"]
            for r in funnel_counts(
                _ev(spark, rows), ["view", "click"]
            ).collect()
        }
        assert got == {"view": 1, "click": 1}

    def test_validation(self, spark):
        df = _ev(spark, [(1, "view", _t(0))])
        with pytest.raises(ValueError):
            funnel_counts(df, [])
        with pytest.raises(ValueError):
            funnel_counts(df, ["a", "a"])

    def test_twin_parity(self, spark):
        rows = [
            (u, t, _t(u * 31 + i * 17))
            for u in range(25)
            for i, t in enumerate(
                ["view", "click", "view", "purchase", "click"][: 2 + u % 4]
            )
        ]
        df = _ev(spark, rows)
        got = [
            tuple(r)
            for r in funnel_counts(
                df, ["view", "click", "purchase"]
            ).collect()
        ]
        duck = duckdb.connect()
        duck.register(
            "events",
            pd.DataFrame(rows, columns=["user_id", "event_type", "ts"]),
        )
        want = [
            tuple(r)
            for r in duck.sql(
                funnel_oracle_sql(["view", "click", "purchase"])
            ).fetchall()
        ]
        assert got == want


class TestCohortRetention:
    def test_triangle_shape(self, spark):
        # u1 first in period 0 and active in periods 0,2; u2 first in
        # period 1, active 1 only
        P = 100
        rows = [
            (1, "e", _t(5)), (1, "e", _t(2 * P + 1)),
            (2, "e", _t(P + 3)), (2, "e", _t(P + 50)),
        ]
        base = dt.datetime(2024, 1, 1).timestamp()
        base_p = int(base) // P
        got = {
            (r["cohort_period"] - base_p, r["period_offset"]): r["users"]
            for r in cohort_retention(
                _ev(spark, rows), period_s=P
            ).collect()
        }
        assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}

    def test_offset_zero_is_cohort_size(self, spark):
        rows = [(u, "e", _t(u)) for u in range(10)] + [
            (u, "e", _t(1000 + u)) for u in range(5)
        ]
        got = cohort_retention(_ev(spark, rows), period_s=500).collect()
        by_off = {
            (r["cohort_period"], r["period_offset"]): r["users"]
            for r in got
        }
        cohorts = {c for c, _ in by_off}
        assert all((c, 0) in by_off for c in cohorts)

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            cohort_retention(_ev(spark, [(1, "e", _t(0))]), period_s=0)

    def test_twin_parity(self, spark):
        rows = [
            (u, "e", _t(u * 997 + i * 211))
            for u in range(30)
            for i in range(1 + u % 5)
        ]
        df = _ev(spark, rows)
        got = [
            tuple(r)
            for r in cohort_retention(df, period_s=600).collect()
        ]
        duck = duckdb.connect()
        duck.register(
            "events",
            pd.DataFrame(rows, columns=["user_id", "event_type", "ts"]),
        )
        want = [
            tuple(r)
            for r in duck.sql(
                cohort_retention_oracle_sql(period_s=600)
            ).fetchall()
        ]
        assert got == want
