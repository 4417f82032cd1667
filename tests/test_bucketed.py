"""Co-located bucketed joins: two tables bucketed by conv_id must join
and aggregate with ZERO Exchange nodes — the shuffle-elision the 100 TB
layout depends on."""

import pytest
from planutil import n_exchanges, plan
from pyspark.sql import functions as F

from documentai_ocr_spark.bucketing import colocated_join, write_bucketed
from documentai_ocr_spark.extract import extract_turns
from documentai_ocr_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    tr = spark.createDataFrame(synth_transcripts(n_convs=12, seed=9))
    write_bucketed(tr, "b_transcripts", str(base / "tr"), n_buckets=4)
    ext = extract_turns(tr).select("conv_id", "turn_idx", "n_spans")
    write_bucketed(ext, "b_extracted", str(base / "ext"), n_buckets=4)
    yield
    spark.sql("DROP TABLE IF EXISTS b_transcripts")
    spark.sql("DROP TABLE IF EXISTS b_extracted")


def test_colocated_join_no_shuffle(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # bucket col ⊂ join keys: allow co-partition on the subset (the
    # pre-3.3 behavior; correct because equal keys still co-locate)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try:
        j = colocated_join(
            spark, "b_transcripts", "b_extracted", ["conv_id", "turn_idx"]
        )
        p = plan(j)
        assert "SortMergeJoin" in p
        assert n_exchanges(p) == 0, p  # both sides read bucketed scans
        # and the join is actually correct: 1:1 on the full turn key
        n = j.count()
        assert n == spark.table("b_transcripts").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")


def test_bucketed_agg_no_shuffle(spark, bucketed):
    """A groupBy on the bucket key aggregates within buckets — no
    exchange before the aggregate."""
    agg = (
        spark.table("b_extracted")
        .groupBy("conv_id")
        .agg(F.sum("n_spans").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    p = plan(agg)
    assert n_exchanges(p) == 0, p
    rows = {r.conv_id: r.n for r in agg.collect()}
    assert len(rows) == 12


def test_range_sorted_layout_prunes(spark, tmp_path):
    """write_range_sorted: output files must cover disjoint key ranges
    (parquet footer min/max = file-level pruning at scale) and be sorted
    inside each file."""
    import glob

    import pyarrow.parquet as pq

    from documentai_ocr_spark.bucketing import write_range_sorted

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "range_sorted")
    write_range_sorted(docs, out, "doc_id", n_files=8)

    spans = []
    for f in glob.glob(out + "/part-*.parquet"):
        pf = pq.ParquetFile(f)
        ids = pf.read(columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids), f"{f} not sorted"
        md = pf.metadata
        col = [
            md.row_group(g).column(i)
            for g in range(md.num_row_groups)
            for i in range(md.row_group(g).num_columns)
            if md.row_group(g).column(i).path_in_schema == "doc_id"
        ]
        lo = min(c.statistics.min for c in col)
        hi = max(c.statistics.max for c in col)
        spans.append((lo, hi))
    spans.sort()
    assert len(spans) >= 2
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next, "file key ranges overlap"


def test_compaction_reduces_file_count(spark, tmp_path):
    """64 tiny files → a handful of target-sized ones, content equal."""
    import glob

    from documentai_ocr_spark.bucketing import compact_small_files

    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(64).write.parquet(src)
    assert len(glob.glob(src + "/part-*.parquet")) == 64

    n_out = compact_small_files(spark, src, out, target_bytes=256 * 1024)
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == n_out < 16
    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert a == b


def test_zorder_prunes_both_dims(spark, tmp_path_factory):
    """Per-file min/max bounding boxes under the z-order layout must
    prune point-range predicates on EITHER dimension, while a linear
    sort by dim X prunes only X: for a narrow Y-band query, count the
    files whose [min,max] Y-interval intersects the band — z-order must
    intersect strictly fewer than the X-sorted layout (which degrades
    to ~all files)."""
    import pyspark.sql.functions as F

    from documentai_ocr_spark.bucketing import (
        write_range_sorted,
        write_zorder,
    )

    base = tmp_path_factory.mktemp("zorder")
    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select(
            "event_id",
            F.col("user_id").cast("long").alias("x"),
            F.unix_millis(F.col("ts").cast("timestamp")).alias("y"),
        )
    )
    zpath, lpath = str(base / "z"), str(base / "linear")
    write_zorder(ev, zpath, "x", "y", n_files=16)
    write_range_sorted(ev, lpath, "x", n_files=16)

    def files_touching_y_band(path, lo_frac, hi_frac):
        df = spark.read.parquet(path).withColumn(
            "f", F.input_file_name()
        )
        stats = (
            df.groupBy("f")
            .agg(F.min("y").alias("ymin"), F.max("y").alias("ymax"))
            .collect()
        )
        gmin = min(r.ymin for r in stats)
        gmax = max(r.ymax for r in stats)
        lo = gmin + (gmax - gmin) * lo_frac
        hi = gmin + (gmax - gmin) * hi_frac
        touch = sum(1 for r in stats if r.ymax >= lo and r.ymin <= hi)
        return touch, len(stats)

    z_touch, z_total = files_touching_y_band(zpath, 0.40, 0.45)
    l_touch, l_total = files_touching_y_band(lpath, 0.40, 0.45)
    assert z_total >= 8 and l_total >= 8
    # linear-by-x layout: y is uncorrelated with file placement → the
    # band touches (almost) every file; z-order: a 5% band touches a
    # strict subset
    assert l_touch >= l_total - 1
    assert z_touch < l_touch
    assert z_touch <= z_total // 2


def test_compact_rejects_in_place(spark, tmp_path):
    """out_path == path must be rejected before any write: overwrite
    deletes the lazy read's input mid-scan."""
    import pytest

    from documentai_ocr_spark.bucketing import compact_small_files

    p = str(tmp_path / "t")
    spark.range(10).write.parquet(p)
    with pytest.raises(ValueError, match="must differ"):
        compact_small_files(spark, p, p)
    with pytest.raises(ValueError, match="must differ"):
        compact_small_files(spark, p, p + "/")
    # URI-scheme alias of the same directory must also be caught
    with pytest.raises(ValueError, match="must differ"):
        compact_small_files(spark, p, "file://" + p)
    # symlink alias of the same directory must also be caught
    import os

    link = str(tmp_path / "tlink")
    os.symlink(p, link)
    with pytest.raises(ValueError, match="must differ"):
        compact_small_files(spark, p, link)
    # the input survived untouched
    assert spark.read.parquet(p).count() == 10


def test_ivf_index_layout_prunes_partitions(spark, tmp_path):
    """The persisted IVF layout must turn a probe into a partition-
    PRUNED scan: the cluster IN (...) filter reaches the scan as a
    PartitionFilter (files outside the probed cells are never opened),
    and the probe's results must match the in-memory IVF path's recall
    contract (>= 0.85 vs brute force — same operating point)."""
    from documentai_ocr_spark.queries.simsearch import (
        _IVF_K,
        _KNN_NQUERIES,
        _emb_double,
        probe_ivf_index,
        q_knn_cosine,
        write_ivf_index,
    )

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "ivf_index")
    cents = write_ivf_index(spark, sf, path)
    # layout: one directory per cluster id
    import os

    parts = [p for p in os.listdir(path) if p.startswith("cluster=")]
    assert len(parts) == _IVF_K

    queries = _emb_double(spark, sf).where(f"vec_id < {_KNN_NQUERIES}")
    res = probe_ivf_index(spark, path, cents, queries)

    # partition pruning is visible in the scan node
    p = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    )
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", p)
    assert m and "cluster" in m.group(1), p[:1200]

    exact = {(r.query_id, r.neighbor_id) for r in q_knn_cosine(spark, sf).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in res.collect()}
    assert len(exact & approx) / len(exact) >= 0.85
