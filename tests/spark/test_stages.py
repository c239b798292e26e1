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


def test_annotate_pages_person_metadata(spark):
    # A8 through the Spark path: per-page known person drives patient
    # tagging; null person rows skip A8 (reference metadata=None behavior)
    from deduce_spark.spark.stages import AnnotatePipeline

    pipe = AnnotatePipeline(spark)
    schema = (
        "url string, warc_ts timestamp, text string, lang string, "
        "person struct<first_names:array<string>, initials:string, "
        "surname:string>"
    )
    import datetime as dt

    ts = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", ts, "betreft: Jan Jansen, de patient.", "nl",
         (["Jan"], None, "Jansen")),
        ("u2", ts, "betreft: Jan Jansen, de patient.", "nl", None),
    ]
    pages = spark.createDataFrame(rows, schema)
    out = pipe.annotate_pages(
        pages, lang="nl", from_html=False, person_col="person"
    )
    tags = {
        r["url"]: sorted(m["tag"] for m in r["mentions"])
        for r in out.collect()
    }
    assert "patient" in tags["u1"]
    # without metadata the same text still gets name mentions, but they
    # cannot be patient-tagged
    assert "patient" not in tags["u2"] and len(tags["u2"]) >= 1
