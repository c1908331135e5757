"""SynonymEngine / StopwordsManager parity + mappings validation (round 2:
VERDICT items 7-9)."""

import json

import pytest
from pyspark.sql import functions as F

from search_engine_spark.analysis.stopwords import (StopwordsManager,
                                                    auto_stopwords)
from search_engine_spark.operators.index_build import IndexConfig, build_index
from search_engine_spark.plans.dsl import SparkSearchEngine
from search_engine_spark.synonyms import SynonymEngine


# ---------------------------------------------------------------------------
# SynonymEngine (SynonymEngine.ts parity)
# ---------------------------------------------------------------------------

def test_synonym_engine_file_roundtrip(tmp_path):
    p = str(tmp_path / "synonyms.json")
    with open(p, "w") as fh:
        json.dump({"Quick": ["Fast", "RAPID"], "bad": "notalist",
                   "empty": []}, fh)
    eng = SynonymEngine(p)
    # keys and values lowercased; invalid / empty entries skipped
    assert eng.get("quick") == ["fast", "rapid"]
    assert eng.get("QUICK") == ["fast", "rapid"]   # lookup normalizes too
    assert not eng.has("bad") and not eng.has("empty")
    # add persists
    eng.add("quick", "Speedy")
    eng2 = SynonymEngine(p)
    assert "speedy" in eng2.get("quick")
    # remove persists; removing the last value drops the key
    assert eng2.remove("quick", "fast")
    assert eng2.remove("quick", "rapid") and eng2.remove("quick", "speedy")
    assert not SynonymEngine(p).has("quick")
    assert eng2.remove("quick", "zzz") is False


def test_synonym_engine_api_surface(tmp_path):
    eng = SynonymEngine(str(tmp_path / "s.json"))
    assert not eng.is_enabled()
    eng.add("car", "auto")
    eng.add("car", "vehicle")
    eng.add("fast", "quick")
    assert eng.is_enabled() and eng.size() == 2
    assert eng.keys() == ["car", "fast"]
    assert eng.get_synonyms("car") == ["auto", "vehicle"]
    st = eng.stats()
    assert st["total_keys"] == 2 and st["total_synonyms"] == 3
    assert eng.remove_key("car") and eng.size() == 1
    eng.clear()
    assert eng.size() == 0
    with pytest.raises(ValueError):
        eng.add("", "x")
    with pytest.raises(ValueError):
        SynonymEngine("")


def test_engine_accepts_synonym_engine_and_multiword(tmp_path, spark):
    docs = spark.createDataFrame(
        [(0, "data rules"), (1, "big table wins"), (2, "big only"),
         (3, "table only"), (4, "nothing here")],
        "doc_id long, text string")
    idx = build_index(docs, IndexConfig(fields={"text": "text"}, n_buckets=2))
    syn = SynonymEngine(str(tmp_path / "syn.json"))
    syn.add("data", "big table")        # multi-word synonym
    eng = SparkSearchEngine(idx, docs, synonyms=syn)
    got = {r["doc_id"] for r in eng.candidates(
        {"term": {"field": "text", "value": "data"}}).collect()}
    # docs with 'data' OR (both 'big' AND 'table') — never big/table alone
    assert got == {0, 1}
    # scoring path also runs over the expanded terms
    scored = eng.search({"term": {"field": "text", "value": "data"}}, size=5)
    assert {r["doc_id"] for r in scored.collect()} == {0, 1}


# ---------------------------------------------------------------------------
# StopwordsManager + auto-detection (StopwordsManager.ts parity)
# ---------------------------------------------------------------------------

def test_stopwords_manager_roundtrip(tmp_path):
    p = str(tmp_path / "stopwords.json")
    m = StopwordsManager(p, threshold=0.5)
    assert m.size() == 0
    m.add("The")
    m.add("and")
    assert m.has("THE") and m.get("the")
    m2 = StopwordsManager(p)
    assert m2.get_all() == ["and", "the"]
    assert m2.remove("and") and not m2.remove("zzz")
    m2.clear()
    assert StopwordsManager(p).size() == 0


def test_auto_stopwords_from_term_stats(tmp_path, spark):
    # 'the' in every doc, 'data' in 2/4, 'rare' in 1/4
    docs = spark.createDataFrame(
        [(0, "the data point"), (1, "the data set"),
         (2, "the other rare"), (3, "the thing")],
        "doc_id long, text string")
    idx = build_index(docs, IndexConfig(fields={"text": "text"}, n_buckets=2))
    detected = auto_stopwords(idx.term_stats, idx.total_docs,
                              threshold=0.75).collect()
    assert [r["term"] for r in detected] == ["the"]
    m = StopwordsManager(str(tmp_path / "sw.json"), threshold=0.75)
    new = m.auto_detect(idx.term_stats, idx.total_docs)
    assert new == ["the"] and m.has("the")
    # rebuilding with the detected stopwords removes them from the index
    idx2 = build_index(docs, IndexConfig(
        fields={"text": "text"}, n_buckets=2,
        stopwords=m.as_config_tuple()))
    terms = {r["term"] for r in idx2.term_stats.collect()}
    assert "the" not in terms and "data" in terms
    # dl shrinks accordingly (stopwords are dropped before counting)
    assert dict(idx2.doc_stats.collect())[3] == 1


# ---------------------------------------------------------------------------
# explicit-mappings validation (FieldType.ts whitelist)
# ---------------------------------------------------------------------------

def test_index_config_rejects_unknown_field_type():
    with pytest.raises(ValueError, match="invalid field type"):
        IndexConfig(fields={"text": "txet"})
    with pytest.raises(ValueError, match="invalid field name"):
        IndexConfig(fields={"": "text"})
    # every reference type is accepted
    IndexConfig(fields={"a": "text", "b": "keyword", "c": "email",
                        "d": "url", "e": "phone", "f": "geo_point",
                        "g": "date", "h": "object", "i": "long"})
