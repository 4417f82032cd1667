"""Shared helpers for the query registry."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan for one driver table. Column pruning + predicate
    pushdown happen in the callers (keep filters outside UDFs so Catalyst
    sees them)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
