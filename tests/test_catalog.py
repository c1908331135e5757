"""Multi-index catalog: create/list/search/delete isolation."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.catalog import IndexCatalog
from search_engine_spark.operators.index_build import IndexConfig
from search_engine_spark.sources.synth import synth_pages


def test_catalog_lifecycle(tmp_path, spark):
    cat = IndexCatalog(spark, str(tmp_path / "indices"))
    pages = synth_pages(spark, 200).cache()
    a = pages.where(F.col("doc_id") < 100)
    b = pages.where(F.col("doc_id") >= 100)
    cfg = IndexConfig(id_col="doc_id", fields={"text": "text"}, n_buckets=2)

    cat.create_index("alpha", a, cfg)
    cat.create_index("beta", b, cfg)
    assert cat.list_indexes() == ["alpha", "beta"]
    assert cat.stats("alpha")["total_docs"] == 100

    # per-index isolation: same query, disjoint doc sets
    ra = {r["doc_id"] for r in cat.search(a, {"match_all": {}}, "alpha",
                                          size=1000).collect()}
    rb = {r["doc_id"] for r in cat.search(b, {"match_all": {}}, "beta",
                                          size=1000).collect()}
    assert ra == set(range(100))
    assert rb == set(range(100, 200))

    with pytest.raises(ValueError):
        cat.create_index("alpha", a, cfg)           # exists
    cat.create_index("alpha", a, cfg, overwrite=True)

    assert cat.delete_index("beta") is True
    assert cat.list_indexes() == ["alpha"]
    assert cat.delete_index("beta") is False

    with pytest.raises(ValueError):
        cat.create_index("../escape", a, cfg)
