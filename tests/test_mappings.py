"""Dynamic-mappings auto-detection parity with MappingsManager semantics
(detection order, string subtyping, field-name heuristics, geo shapes)."""

import datetime

from search_engine_spark.analysis.mappings import (auto_map,
                                                   detect_field_type,
                                                   detect_keyword_or_text,
                                                   indexable_fields,
                                                   infer_mappings)


def test_string_subtyping_order():
    assert detect_keyword_or_text("a@b.co") == "email"
    assert detect_keyword_or_text("https://x.y/z") == "url"
    assert detect_keyword_or_text("http://x.y") == "url"
    assert detect_keyword_or_text("2024-01-31") == "date"
    assert detect_keyword_or_text("2024-01-31T10:00:00") == "date"
    assert detect_keyword_or_text("42.5") == "number"
    assert detect_keyword_or_text(" 7 ") == "number"
    # name heuristics fire before length/word checks
    assert detect_keyword_or_text("x", "product_name") == "text"
    assert detect_keyword_or_text("x", "tags") == "text"
    assert detect_keyword_or_text("x" * 101) == "text"
    assert detect_keyword_or_text("two words") == "text"
    assert detect_keyword_or_text("identifier") == "keyword"
    # email beats name heuristic (checked first)
    assert detect_keyword_or_text("a@b.co", "name") == "email"


def test_value_detection():
    assert detect_field_type(None) is None
    assert detect_field_type(True) == "boolean"
    assert detect_field_type(3) == "number"
    assert detect_field_type(3.5) == "number"
    assert detect_field_type(datetime.date(2024, 1, 1)) == "date"
    assert detect_field_type([1.0, 2.0]) == "geo_point"
    assert detect_field_type([1.0, 2.0, 3.0]) == "number"
    assert detect_field_type([]) is None
    assert detect_field_type([{"a": 1}]) == "object"
    assert detect_field_type({"lat": 1, "lon": 2}) == "geo_point"
    assert detect_field_type({"a": 1}) == "object"
    assert detect_field_type({}) is None


def test_auto_map_walk():
    doc = {
        "id": "d1",                      # skipped at top level
        "title": "Hello World",          # name heuristic -> text
        "status": "active",              # keyword
        "price": 9.99,                   # number
        "location": {"lat": 1.0, "lon": 2.0},
        "meta": {"author": "bob", "tags": ["new", "sale"]},
        "features": ["alpha beta", "gamma"],
        "empty": [],
    }
    m = auto_map(doc)
    assert "id" not in m
    assert m["title"] == "text"
    assert m["status"] == "keyword"
    assert m["price"] == "number"
    assert m["location"] == "geo_point"
    assert m["meta.author"] == "keyword"
    assert m["meta.tags"] == "text"      # 'tag' name pattern
    assert m["features"] == "text"       # first element is multi-word
    assert "empty" not in m
    idx = indexable_fields(m)
    assert set(idx) == {"title", "status", "meta.author", "meta.tags",
                        "features"}


def test_infer_mappings_dataframe(spark):
    from search_engine_spark.sources.synth import synth_docs
    df = synth_docs(spark, 50)
    m = infer_mappings(df, id_col="id")
    assert m["name"] == "text"
    assert m["price"] == "number"
    assert m["location"] == "geo_point"
    assert m["created"] == "date"
    assert m["email"] in ("email", "keyword")  # first non-null value decides
    assert m["status"] == "keyword"
    assert "id" not in m
