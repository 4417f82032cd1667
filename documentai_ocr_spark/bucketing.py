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


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target_bytes) files. Streaming sinks and bucketed
    commits accumulate many under-sized files; at 10^12 rows the scan's
    task count (and the NameNode/manifest pressure) tracks FILE count,
    not data size, so periodic compaction is what keeps read
    parallelism proportional to data. Sizing comes from the source
    files themselves (one listing, no data pass); the rewrite is one
    coalesce-free repartition so output files are even-sized regardless
    of input skew. Returns the number of output files.

    In-place compaction (out_path == path) is unsupported and rejected:
    the lazy read would race mode('overwrite') deleting its own input
    mid-scan and lose the data. Compact to a sibling dir and swap. The
    guard compares HADOOP-QUALIFIED URIs (so `file:///x` and `/x` are
    the same target) and, for local paths, symlink-resolved realpaths —
    aliases of one directory cannot slip past it."""
    import math
    import os

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()

    def _qualified(p_str: str) -> str:
        hp = jvm.org.apache.hadoop.fs.Path(p_str)
        return str(hp.getFileSystem(conf).makeQualified(hp).toUri())

    def _local_real(p_str: str) -> str:
        # strip a file: scheme so realpath sees the filesystem path
        for pre in ("file://", "file:"):
            if p_str.startswith(pre):
                p_str = p_str[len(pre):] or "/"
                break
        return os.path.realpath(p_str)

    same_uri = _qualified(out_path) == _qualified(path)
    both_local = all(
        _qualified(x).startswith("file:") for x in (out_path, path)
    )
    same_real = both_local and _local_real(out_path) == _local_real(path)
    if same_uri or same_real:
        raise ValueError(
            "compact_small_files: out_path must differ from path — "
            "overwrite-while-reading would destroy the input; write to "
            "a sibling directory and rename"
        )
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    total = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    n_out = max(1, math.ceil(total / target_bytes))
    (
        spark.read.parquet(path)
        .repartition(n_out)
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_out


def write_zorder(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = DEFAULT_BUCKETS,
    bits: int = 16,
) -> None:
    """Z-order (Morton-interleaved) two-dimensional layout: both columns
    are min/max-scaled to ``bits``-bit grid cells, their bits
    interleaved into one z-value, and the output range-partitioned and
    file-sorted by it. Each file then covers a compact 2-D tile, so
    parquet footer min/max stats prune files for predicates on EITHER
    column — the property a single-column sort (write_range_sorted)
    only gives to its sort key. This is the Delta/Iceberg OPTIMIZE
    ZORDER technique for multi-dimensional scan locality at 10^12 rows.

    Min/max scaling is one tiny aggregate (two scalars per column,
    broadcast into the expression); the z-value itself is pure bit
    arithmetic inside codegen. For heavily skewed columns substitute a
    rank/percentile scaling — the interleave and layout stages are
    unchanged."""
    from pyspark.sql import functions as F

    mm = df.agg(
        F.min(col_x).alias("x0"),
        F.max(col_x).alias("x1"),
        F.min(col_y).alias("y0"),
        F.max(col_y).alias("y1"),
    ).collect()[0]
    top = (1 << bits) - 1

    def scaled(c, lo, hi):
        span = float(hi - lo) if hi > lo else 1.0
        return F.least(
            F.lit(top),
            F.floor((F.col(c) - F.lit(lo)) / F.lit(span) * (top + 1)).cast(
                "long"
            ),
        )

    gx = scaled(col_x, mm.x0, mm.x1)
    gy = scaled(col_y, mm.y0, mm.y1)
    # disjoint bit positions → addition == bitwise-or (Column.__or__ is
    # the boolean operator in PySpark, so build the word additively)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(gx, i) % 2, 2 * i + 1)
            + F.shiftleft(F.shiftright(gy, i) % 2, 2 * i)
        )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
