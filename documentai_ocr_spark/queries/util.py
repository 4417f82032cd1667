"""Shared helpers for the query registry."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan for one driver table. Column pruning + predicate
    pushdown happen in the callers (keep filters outside UDFs so Catalyst
    sees them)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame) -> DataFrame:
    """Fan a single-row-group scan across the cluster before per-row-heavy
    work (the test tables are one parquet file = one split; production
    tables have many files/buckets and don't need this). The round-robin
    shuffle of a few MB buys full parallelism for everything downstream."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
