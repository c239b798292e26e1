"""Differential test: Spark pipeline ≡ pure-Python kernel oracle, page by
page, byte-identical text and identical mention sets (BASELINE.md targets)."""

import pytest

from deduce_spark.fixtures import generate_pages
from deduce_spark.kernel.html_text import extract_text
from deduce_spark.kernel.mention import Mention


@pytest.fixture(scope="module")
def annotated_rows(spark, pipeline, pages_path):
    pages = spark.read.parquet(pages_path)
    out = pipeline.annotate_pages(pages, lang=None, from_html=True)
    return {r["url"]: r for r in out.collect()}


def oracle(engine, n_pages=80):
    cols = generate_pages(n_pages)
    out = {}
    for url, html in zip(cols["url"], cols["html"]):
        text = extract_text(html)
        doc = engine.deidentify(text)
        out[url] = (text, doc.mentions, doc.metadata["redacted_text"])
    return out


def test_spark_matches_oracle(annotated_rows, engine):
    expected = oracle(engine)
    assert set(annotated_rows) == set(expected)
    for url, (text, mentions, redacted) in expected.items():
        row = annotated_rows[url]
        assert row["text"] == text, f"text drift for {url}"
        got = {
            Mention(m["text"], m["start_char"], m["end_char"], m["tag"])
            for m in row["mentions"]
        }
        want = {Mention(m.text, m.start, m.end, m.tag) for m in mentions}
        assert got == want, f"mention drift for {url}"
        assert row["redacted_text"] == redacted, f"redaction drift for {url}"


def test_mentions_long(spark, pipeline, pages_path):
    pages = spark.read.parquet(pages_path)
    annotated = pipeline.annotate_pages(pages, lang="nl")
    long = pipeline.mentions_long(annotated)
    assert long.columns == [
        "url", "warc_ts", "text", "start_char", "end_char", "tag", "priority"
    ]
    tags = {r["tag"] for r in long.select("tag").distinct().collect()}
    assert {"datum", "locatie", "persoon"} <= tags


def test_lang_filter_pushdown(spark, pipeline, pages_path):
    pages = spark.read.parquet(pages_path)
    annotated = pipeline.annotate_pages(pages, lang="nl")
    plan = annotated._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,nl)]" in plan
