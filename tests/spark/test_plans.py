"""Physical-plan audit over the whole driver surface.

Three invariants every query (scored AND demoted) must hold at any scale:
- no row-at-a-time Python (`BatchEvalPython`) anywhere — Python work is
  only allowed Arrow-batched (MapInPandas / ArrowEvalPython);
- parquet scans under a lang/doc_id filter actually push the predicate
  (`PushedFilters`) so a 100 TB scan prunes at the source;
- no unpartitioned window over an unbounded input — `Window.orderBy(...)`
  with no partitionBy serializes the whole input onto ONE task, the
  classic scale killer (VERDICT r3 "what's wrong" #1).
"""

import re

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _all_query_fns():
    return {**entry_mod.queries(), **entry_mod.demoted_queries()}


def test_no_row_python_in_any_query_plan(spark):
    bad = {}
    for name, fn in sorted(_all_query_fns().items()):
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            bad[name] = "row-at-a-time Python UDF in plan"
    assert not bad, f"row-Python plans: {bad}"


# Unpartitioned windows whose INPUT is bounded by construction — the only
# two allowed in the whole surface:
# - acctbal_deciles: exact_ntile's prefix-sum window runs over the
#   per-bucket COUNT table (<= n_buckets=256 rows), never the base table
#   (relational.exact_ntile step 4);
# - orders_daily_delta: lag() over the per-date AGGREGATE — bounded by
#   calendar days, not by input rows.
_BOUNDED_WINDOW_OK = {"acctbal_deciles", "orders_daily_delta"}

_WINDOW_LINE = re.compile(r"\bWindow\s+(\[.*)$")


def _has_unpartitioned_window(plan: str) -> bool:
    """A logical-plan Window node prints ``Window [fns], [partitionSpec],
    [orderSpec]`` — but either spec is OMITTED when empty.  So 3 groups =
    partitioned+ordered; 2 groups = partitioned-unordered (second group
    has no ASC/DESC: fine) or unpartitioned-ordered (second group is an
    order spec: the single-task shape we forbid)."""
    for line in plan.splitlines():
        m = _WINDOW_LINE.search(line)
        if not m:
            continue
        rest, depth, cur, groups = m.group(1), 0, [], []
        for ch in rest:
            if ch == "[":
                depth += 1
                if depth == 1:
                    cur = []
                    continue
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    groups.append("".join(cur))
                    continue
            if depth >= 1:
                cur.append(ch)
        if len(groups) < 2:
            return True  # ordered window with NO spec groups at all
        if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b", groups[1]):
            return True
    return False


def test_no_unpartitioned_unbounded_window(spark):
    bad = {}
    for name, fn in sorted(_all_query_fns().items()):
        if name in _BOUNDED_WINDOW_OK:
            continue
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        if _has_unpartitioned_window(plan):
            bad[name] = "unpartitioned Window over unbounded input"
    assert not bad, f"single-task window plans: {bad}"


@pytest.mark.parametrize(
    "name,fragment",
    [
        # lang equality must reach the documents/pages parquet scan
        ("doc_scan_filter", "PushedFilters:"),
        ("doc_lang_id", "PushedFilters:"),
    ],
)
def test_scan_pushdown(spark, name, fragment):
    df = _all_query_fns()[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert fragment in plan
    # at least one concrete pushed filter somewhere in the scan nodes
    assert "PushedFilters: []" not in plan.replace(" ", "") or (
        "IsNotNull" in plan or "EqualTo" in plan
    )
