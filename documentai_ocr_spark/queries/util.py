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
    work — but ONLY when the scan is under-split (the test tables are one
    parquet file = one split). When the input already has at least one
    partition per core (any production multi-file/bucketed table), this
    is a no-op: an unconditional repartition would be a needless full
    shuffle of the corpus at scale."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism)
