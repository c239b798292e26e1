"""Reference regression corpus through the SPARK path (Arrow/mapInPandas):
the distributed plumbing must preserve kernel semantics bit-for-bit."""

import pytest

from deduce_spark.spark import regression as reg


@pytest.mark.skipif(not reg.CASES_DIR.exists(), reason="corpus unavailable")
def test_corpus_pr_is_perfect(spark, pipeline):
    pr = reg.corpus_pr(spark, pipeline)
    assert pr["total_cases"] == 463
    assert pr["exact_cases"] == pr["total_cases"], pr["per_group"]
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0
