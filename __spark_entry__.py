"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline; ``queries`` /
``oracle_sql`` expose the operator registry (documentai_ocr_spark.queries)
for the driver's DuckDB cross-check at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from documentai_ocr_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-turn main-content extraction over the transcripts
    table derived from sf0.001 documents."""
    return QUERIES["x_extract_turns"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family (SURVEY.md §2 mapping in
    documentai_ocr_spark/queries/__init__.py)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; extraction/ANN ops are omitted
    (non-SQL-expressible — golden-tested in tests/ instead)."""
    return dict(ORACLES)
