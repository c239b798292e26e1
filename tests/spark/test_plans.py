"""Physical-plan audit over the whole driver surface.

Two invariants every query must hold at any scale:
- no row-at-a-time Python (`BatchEvalPython`) anywhere — Python work is
  only allowed Arrow-batched (MapInPandas / ArrowEvalPython);
- parquet scans under a lang/doc_id filter actually push the predicate
  (`PushedFilters`) so a 100 TB scan prunes at the source.
"""

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def test_no_row_python_in_any_query_plan(spark):
    bad = {}
    for name, fn in sorted(entry_mod.queries().items()):
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            bad[name] = "row-at-a-time Python UDF in plan"
    assert not bad, f"row-Python plans: {bad}"


@pytest.mark.parametrize(
    "name,fragment",
    [
        # lang equality must reach the documents/pages parquet scan
        ("doc_scan_filter", "PushedFilters:"),
        ("doc_lang_id", "PushedFilters:"),
    ],
)
def test_scan_pushdown(spark, name, fragment):
    df = entry_mod.queries()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert fragment in plan
    # at least one concrete pushed filter somewhere in the scan nodes
    assert "PushedFilters: []" not in plan.replace(" ", "") or (
        "IsNotNull" in plan or "EqualTo" in plan
    )
