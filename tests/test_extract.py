"""HTML → text extraction invariant (input_hint: byte-identical extracted
text per url). The synthesized corpus renders html FROM its text column, so
text is the exact ground truth the extractor must reproduce — per url,
bytes equal, across the pure-Python twin and the Arrow UDF."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.sources.extract import (extract_text,
                                                 extract_text_udf,
                                                 with_extracted_text)
from search_engine_spark.sources.synth import synth_pages


def test_extract_byte_identical_per_url(spark):
    pages = synth_pages(spark, 500)
    bad = (pages
           .withColumn("got", extract_text_udf(F.col("html")))
           .where(F.col("got") != F.col("text"))
           .select("url", "text", "got"))
    rows = bad.collect()
    assert rows == [], rows[:3]


def test_python_twin_matches_udf_semantics(spark):
    rows = synth_pages(spark, 64).select("html", "text").collect()
    for r in rows:
        assert extract_text(bytes(r["html"])) == r["text"]


def test_extractor_edge_cases():
    assert extract_text(None) is None
    assert extract_text(b"") == ""
    assert extract_text("<p>a  \n b</p>") == "a b"
    assert extract_text(
        "<head><title>skip</title></head><body>keep &amp; go</body>") \
        == "keep & go"
    assert extract_text(
        "<body>x<script>var y=1;</script> z<style>p{}</style>!</body>") \
        == "x z!"
    # void elements inside head don't disturb the head flag
    assert extract_text("<head><meta><link></head><p>ok</p>") == "ok"
    # undecodable bytes are replaced, not raised
    assert "ok" in extract_text(b"<p>ok\xff</p>")


def test_extractor_implied_head_end():
    # </head> is OPTIONAL in HTML5 (implied by <body>); html.parser never
    # synthesizes implied end tags, so head must end on the <body> start
    # tag or the whole document body is silently dropped
    assert extract_text(
        "<html><head><title>t</title><body><p>hello world</p></body>"
        "</html>") == "hello world"
    # title outside any head is still markup metadata, not page text
    assert extract_text("<title>t</title><p>x</p>") == "x"
    # a stray <head> after body content must not re-enter skip mode
    assert extract_text("<body>a<head></head>b</body>") == "ab"


def test_with_extracted_text_fills_only_nulls(spark):
    pages = synth_pages(spark, 20)
    # null out half the text column: adapter must restore it from html
    # and leave pre-extracted rows untouched
    holey = pages.withColumn(
        "text", F.when(F.col("doc_id") % 2 == 0, F.col("text")))
    restored = with_extracted_text(holey)
    diff = (restored.alias("a")
            .join(pages.alias("b"), "doc_id")
            .where(F.col("a.text") != F.col("b.text")))
    assert diff.count() == 0
    assert restored.where(F.col("text").isNull()).count() == 0
