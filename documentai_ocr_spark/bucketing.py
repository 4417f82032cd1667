"""Bucketed-table layout: the co-located join strategy for 100 TB.

The reference buckets its corpus by directory (2000 files per dir,
/root/reference/font/characterSegment.py:81-86, project_rec.py:256-259);
SURVEY §4 maps that to the ``bucket(N, conv_id)`` table transform. This
module writes Spark-native bucketed+sorted tables so that every
conv_id-keyed join or aggregation downstream is SHUFFLE-FREE: two tables
bucketed the same way join with zero Exchange nodes (plan-asserted in
tests/test_bucketed.py), which at 10^12 turns converts the dominant
shuffle of transcript ⋈ extraction-state joins into a local merge.

On an Iceberg deployment the same declaration is
``PARTITIONED BY (bucket(N, conv_id))`` + a sort order; this module
covers the session-catalog form that runs anywhere.

Deployment note: when the join keys are a strict superset of the bucket
column (conv_id bucket, (conv_id, turn_idx) join), Spark ≥ 3.3 needs
``spark.sql.requireAllClusterKeysForCoPartition=false`` to accept the
subset co-partitioning — correct because equal keys still co-locate;
set it wherever bucketed layouts are in play.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 16


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    key: str = "conv_id",
    sort: str | None = "turn_idx",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) parquet table in
    the session catalog. Buckets hash on ``key`` — the SAME hash Spark
    uses for shuffle partitioning, which is what makes the join/agg
    shuffle elidable."""
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, key)
    )
    if sort:
        w = w.sortBy(key, sort)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str] | str = "conv_id",
) -> DataFrame:
    """Join two co-bucketed tables. The bucket column must be a SUBSET of
    the join keys (e.g. bucket on conv_id, join on (conv_id, turn_idx)) —
    then Catalyst plans a SortMergeJoin whose BOTH sides read bucketed
    scans: no Exchange anywhere in the plan."""
    if isinstance(keys, str):
        keys = [keys]
    return spark.table(left_table).join(spark.table(right_table), keys)


def write_range_sorted(
    df: DataFrame, path: str, col: str, n_files: int = DEFAULT_BUCKETS
) -> None:
    """Globally range-partitioned, file-sorted output layout:
    ``repartitionByRange`` (range boundaries from a reservoir sample —
    one extra sampling job, then one shuffle) + ``sortWithinPartitions``.
    Every output file then covers a disjoint ``col`` interval and its
    parquet footer min/max stats make range predicates prune whole files
    on read — at 10^12 rows this is what turns "scan the corpus for
    conv range X" into opening a handful of files. Complements
    write_bucketed: hash layout serves equi-joins, range layout serves
    range scans and ordered export."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )
