"""The O(n²) oracle anchors must refuse oversized inputs — the round-1
review found nothing stopped an all-pairs query from running against a
production-sized table."""

import pytest

import documentai_ocr_spark.queries.util as util
from documentai_ocr_spark.queries.util import guard_allpairs


def test_guard_allpairs_refuses_oversized(spark, monkeypatch):
    df = spark.range(50)
    monkeypatch.setattr(util, "ALLPAIRS_MAX_ROWS", 10)
    with pytest.raises(RuntimeError, match="O\\(n\\^2\\)"):
        guard_allpairs(df, "test_query")


def test_guard_allpairs_passes_small(spark):
    df = spark.range(50)
    assert guard_allpairs(df, "test_query") is df


def test_anchor_queries_are_guarded(spark, monkeypatch):
    """The actual anchors call the guard (not just that a guard exists)."""
    from documentai_ocr_spark.queries.dedup import q_simhash_pairs
    from documentai_ocr_spark.queries.simsearch import q_embed_neardup

    monkeypatch.setattr(util, "ALLPAIRS_MAX_ROWS", 3)
    for q in (q_simhash_pairs, q_embed_neardup):
        with pytest.raises(RuntimeError, match="capped"):
            q(spark, "/root/testdata/sf0.001")
