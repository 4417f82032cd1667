"""Source/sink parity (SURVEY.md §2.1): TSV with drop-malformed, binary
file scan, JSON round-trip — the reference's file-based IO re-expressed."""

from pyspark.sql import functions as F


def test_tsv_drop_malformed(spark, tmp_path):
    """labels.txt semantics: 'path \\t text \\t prob', rows with field
    count != 3 skipped (/root/reference/spiltTools.py:20-26)."""
    p = tmp_path / "labels.txt"
    p.write_text(
        "a/1.png\thello\t0.9\n"
        "broken line without tabs\n"
        "b/2.png\tworld\t0.8\n"
        "too\tmany\tfields\there\n"
        "c/3.png\tok\t0.7\n"
    )
    df = (
        spark.read.option("sep", "\t")
        .option("mode", "DROPMALFORMED")
        .schema("path string, text string, prob double")
        .csv(str(p))
    )
    rows = df.collect()
    assert len(rows) == 3
    assert {r.text for r in rows} == {"hello", "world", "ok"}
    # the dir-prefix rewrite (os.path.join analogue)
    out = df.select(F.concat(F.lit("/data/"), "path").alias("full")).collect()
    assert all(r.full.startswith("/data/") for r in out)


def test_binaryfile_scan(spark, tmp_path):
    """Recursive glob scan of binary payloads
    (/root/reference/font/project_rec.py:89: sorted(glob(...)))."""
    sub = tmp_path / "x" / "y"
    sub.mkdir(parents=True)
    for i in range(4):
        (sub / f"p{i}.png").write_bytes(b"\x89PNG" + bytes([i]) * 10)
    (sub / "skip.txt").write_text("not a png")
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .option("recursiveFileLookup", "true")
        .load(str(tmp_path))
        .orderBy("path")
    )
    rows = df.collect()
    assert len(rows) == 4
    assert all(bytes(r.content).startswith(b"\x89PNG") for r in rows)
    assert rows[0].length == 14


def test_json_roundtrip(spark, tmp_path):
    """JSON sink/source + nested to_json/from_json
    (/root/reference/ocrclient/config.py:13-18, easyocr/client.py:41-60)."""
    df = spark.createDataFrame(
        [(1, {"text": "t1", "score": 0.9}), (2, {"text": "t2", "score": 0.4})],
        "id bigint, ocr struct<text:string, score:double>",
    )
    out = str(tmp_path / "j")
    df.select("id", F.to_json("ocr").alias("ocr_json")).write.json(out)
    back = spark.read.json(out).withColumn(
        "ocr", F.from_json("ocr_json", "text string, score double")
    )
    rows = {r.id: r.ocr for r in back.collect()}
    assert rows[1].text == "t1" and abs(rows[2].score - 0.4) < 1e-9


def test_scan_survives_corrupt_file(spark, tmp_path_factory):
    """Production scans meet truncated/garbage files (failed writers,
    partial uploads). With ignoreCorruptFiles the scan must return every
    row of the intact files and skip the garbage instead of failing the
    whole 100-TB job."""
    import os

    base = str(tmp_path_factory.mktemp("corrupt") / "t")
    df = spark.range(0, 100).withColumnRenamed("id", "v")
    df.coalesce(2).write.parquet(base)
    with open(os.path.join(base, "part-junk.snappy.parquet"), "wb") as f:
        f.write(b"PAR1 this is not really parquet \x00\x01\x02")
    got = (
        spark.read.option("ignoreCorruptFiles", "true")
        .parquet(base)
        .count()
    )
    assert got == 100


def test_schema_evolution_merge(spark, tmp_path_factory):
    """Long-lived tables gain columns over time. mergeSchema must union
    the per-file schemas: old files read the new column as NULL, new
    files carry it — no rewrite of 100 TB of history."""
    import pyspark.sql.functions as F

    base = str(tmp_path_factory.mktemp("evolve") / "t")
    spark.range(0, 5).select(
        F.col("id").alias("doc_id")
    ).write.parquet(base)
    spark.range(5, 8).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    ).write.mode("append").parquet(base)
    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) == {"doc_id", "lang"}
    rows = {r.doc_id: r.lang for r in df.collect()}
    assert len(rows) == 8
    assert rows[0] is None and rows[7] == "en"
