"""Streaming front-end: availableNow drain must equal the batch result;
restart with the same checkpoint must not duplicate."""

import pytest
from pyspark.sql import functions as F

from documentai_ocr_spark.extract import extract_turns
from documentai_ocr_spark.streaming import (
    make_sink,
    stream_extract,
    windowed_turn_counts,
)
from documentai_ocr_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def input_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream") / "in")
    pdf = synth_transcripts(n_convs=12, seed=3, skew_factor=3)
    # several files → several micro-batches with maxFilesPerTrigger
    spark.createDataFrame(pdf).repartition(6).write.parquet(d)
    return d


def test_stream_equals_batch(spark, input_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream") / "out")
    ckpt = str(tmp_path_factory.mktemp("stream") / "ckpt")
    q = stream_extract(spark, input_dir, out, ckpt, max_files_per_trigger=2)
    assert q.awaitTermination(120), "drain did not finish in time"
    got = {
        (r.conv_id, r.turn_idx): (r.text, r.n_spans)
        for r in spark.read.parquet(f"{out}/extracted").collect()
    }
    want = {
        (r.conv_id, r.turn_idx): (r.text, r.n_spans)
        for r in extract_turns(spark.read.parquet(input_dir)).collect()
    }
    assert got == want
    n_batches = spark.read.parquet(f"{out}/lineage").count()
    assert n_batches >= 2  # maxFilesPerTrigger split the input

    # restart on the same checkpoint: no new data → no duplicates
    q2 = stream_extract(spark, input_dir, out, ckpt, max_files_per_trigger=2)
    assert q2.awaitTermination(60), "restart drain did not finish in time"
    again = spark.read.parquet(f"{out}/extracted").count()
    assert again == len(want)


def test_sink_retry_is_idempotent(spark, input_dir, tmp_path_factory):
    """A micro-batch retried after a successful write (crash between the
    write and the checkpoint commit) must overwrite its own batch_id
    partition, not duplicate it — the exactly-once contract of the
    foreachBatch sink."""
    out = str(tmp_path_factory.mktemp("stream") / "retry_out")
    sink = make_sink(spark, out)
    src = spark.read.parquet(input_dir)
    b0 = src.limit(40)
    b1 = src.subtract(b0.select(*src.columns)).limit(30)
    sink(b0, 0)
    sink(b1, 1)
    n_after_two = spark.read.parquet(f"{out}/extracted").count()
    sink(b0, 0)  # the retry
    ext = spark.read.parquet(f"{out}/extracted")
    assert ext.count() == n_after_two
    assert ext.select("conv_id", "turn_idx").distinct().count() == n_after_two
    lin = spark.read.parquet(f"{out}/lineage")
    assert lin.count() == 2  # one lineage row per batch, retry overwrote
    per_batch = {r.batch_id: r.n_turns for r in lin.collect()}
    assert per_batch[0] == 40 and per_batch[1] == 30


def test_stateful_conv_progress(spark, input_dir, tmp_path_factory):
    """applyInPandasWithState across several micro-batches: the FINAL
    update per conversation must equal the batch groupBy over the whole
    input (state accumulated correctly across batches), and multi-batch
    conversations must have emitted multiple progressively-growing
    updates."""
    from documentai_ocr_spark.streaming import (
        TRANSCRIPT_SCHEMA,
        stateful_conv_progress,
    )

    ckpt = str(tmp_path_factory.mktemp("stream") / "state_ckpt")
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    q = (
        stateful_conv_progress(src)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stateful drain did not finish in time"
    updates = spark.sql("SELECT * FROM conv_progress").collect()
    assert updates
    final = {}
    for r in updates:  # memory sink appends updates in batch order
        final[r.conv_id] = (r.n_turns, r.n_chars, r.max_turn)
    want = {
        r.conv_id: (r.n_turns, r.n_chars, r.max_turn)
        for r in spark.read.parquet(input_dir)
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum(F.length(F.coalesce("text", F.lit(""))))
            .cast("long")
            .alias("n_chars"),
            F.max("turn_idx").cast("int").alias("max_turn"),
        )
        .collect()
    }
    assert final == want
    # the input spans several micro-batches → some conv got >1 update
    assert len(updates) > len(want)


def test_windowed_counts_schema(spark, input_dir):
    # batch-mode check of the windowed aggregation logic
    df = windowed_turn_counts(spark.read.parquet(input_dir))
    rows = df.collect()
    assert rows and sum(r.n_turns for r in rows) == spark.read.parquet(
        input_dir
    ).count()
    assert all(r.win_start < r.win_end for r in rows)


def test_stream_dedup_drops_replays(spark, tmp_path_factory):
    """Replayed turns across micro-batches must be dropped exactly once:
    feed the same rows in two separate files (two batches with
    maxFilesPerTrigger=1) and expect single delivery."""
    import pandas as pd

    from documentai_ocr_spark.streaming import TRANSCRIPT_SCHEMA, stream_dedup

    base = tmp_path_factory.mktemp("dedupstream")
    src = str(base / "in")
    out = str(base / "out")
    ckpt = str(base / "ckpt")
    pdf = synth_transcripts(n_convs=4, seed=7, skew_factor=1)
    df = spark.createDataFrame(pdf)
    df.coalesce(1).write.parquet(src)                      # batch 1
    df.coalesce(1).write.mode("append").parquet(src)       # batch 2 = replay
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "dedup drain did not finish"
    got = spark.read.parquet(out)
    assert got.count() == len(pdf)  # every replayed row dropped
    assert got.select("conv_id", "turn_idx").distinct().count() == len(pdf)


def test_windowed_counts_drop_late_rows(spark, tmp_path_factory):
    """True watermark semantics, not just schema: once a window has been
    finalized and its state evicted (the watermark passed its end), a
    late row for that window arriving in a later micro-batch is dropped
    — the append output holds exactly one row for the window, at the
    finalized count. Three single-file micro-batches: batch 0 fills
    [10:00,10:10) and posts an 11:00 row; batch 1's 12:00 row advances
    the watermark past the window end, finalizing it at 3; batch 2's
    10:05 straggler must be evicted, not resurrect the window."""
    import time

    import pyspark.sql.functions as SF

    base = tmp_path_factory.mktemp("late")
    ind, ckpt = str(base / "in"), str(base / "ckpt")
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )

    def write_one(ts_list, tag):
        (
            spark.createDataFrame(
                [
                    (f"c{tag}{i}", i, "user", "x", "", x)
                    for i, x in enumerate(ts_list)
                ],
                "conv_id string, turn_idx int, role string, text string,"
                " tool string, ts string",
            )
            .withColumn("ts", SF.to_timestamp("ts"))
            .coalesce(1)
            .write.mode("append")
            .parquet(ind)
        )

    day = "2024-01-01 "
    write_one([day + t for t in ("10:01:00", "10:04:00", "10:08:00", "11:00:00")], "a")
    time.sleep(1.1)  # distinct mtimes keep the batch order deterministic
    write_one([day + "12:00:00"], "b")
    time.sleep(1.1)
    write_one([day + t for t in ("10:05:00", "13:00:00")], "c")

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ind)
    )
    agg = windowed_turn_counts(src, window="10 minutes", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_counts")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1  # exactly the straggler
    rows = spark.sql(
        "SELECT * FROM late_counts WHERE win_start = '2024-01-01 10:00:00'"
    ).collect()
    # one finalized append row, straggler excluded, never re-emitted
    assert len(rows) == 1 and rows[0].n_turns == 3


def test_stream_sessionize_gap_split_and_merge(spark, tmp_path_factory):
    """Session windows across micro-batches: turns within the gap fuse
    into one session (even when a bridging row arrives in a later
    batch — state-store session MERGE), turns beyond the gap start a
    new one, and sessions only emit once the watermark closes them."""
    import time

    import pyspark.sql.functions as SF

    from documentai_ocr_spark.streaming import stream_sessionize

    base = tmp_path_factory.mktemp("sess")
    ind, ckpt = str(base / "in"), str(base / "ckpt")
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )

    def write_one(rows):
        (
            spark.createDataFrame(
                rows,
                "conv_id string, turn_idx int, role string, text string,"
                " tool string, ts string",
            )
            .withColumn("ts", SF.to_timestamp("ts"))
            .coalesce(1)
            .write.mode("append")
            .parquet(ind)
        )

    d = "2024-01-01 "
    # batch 0: two session fragments for c1 at 10:00 and 10:50 (gap 50m
    # > 30m → separate), plus c2 noise
    write_one(
        [
            ("c1", 0, "user", "aaaa", "", d + "10:00:00"),
            ("c1", 1, "asst", "bb", "", d + "10:10:00"),
            ("c1", 2, "user", "cc", "", d + "10:50:00"),
            ("c2", 0, "user", "dd", "", d + "10:05:00"),
        ]
    )
    time.sleep(1.1)
    # batch 1: a 10:30 row BRIDGES c1's two fragments (10:10 +30m ≥
    # 10:30, 10:30 +30m ≥ 10:50) → the state store must MERGE them into
    # one session; a far-future row advances the watermark to close all
    write_one(
        [
            ("c1", 3, "user", "ee", "", d + "10:30:00"),
            ("c3", 0, "user", "f", "", d + "20:00:00"),
        ]
    )

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ind)
    )
    q = (
        stream_sessionize(src, gap="30 minutes", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.conv_id, str(r.sess_start)): (r.n_turns, r.n_chars)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # c1: ONE merged session 10:00..10:50 with all 4 turns
    assert got[("c1", "2024-01-01 10:00:00")] == (4, 10)
    assert not any(k[0] == "c1" and "10:50" in k[1] for k in got)
    # c2: its lone turn emitted as a closed single-row session
    assert got[("c2", "2024-01-01 10:05:00")] == (1, 2)


def test_stream_enrich_join_bound_and_cross_batch(spark, tmp_path_factory):
    """Stream-stream enrich join: an annotation within the 10-minute
    bound joins its turn even when it arrives in a LATER micro-batch
    (state buffering), while one past the bound never matches (the
    range predicate, which is also what lets the engine evict state)."""
    import datetime

    import pandas as pd

    from documentai_ocr_spark.streaming import (
        TRANSCRIPT_SCHEMA,
        stream_enrich_join,
    )

    base = tmp_path_factory.mktemp("enrichstream")
    t_src, a_src = str(base / "turns"), str(base / "anns")
    out, ckpt = str(base / "out"), str(base / "ckpt")
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def mk(rows, cols):
        df = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
        return df.withColumn("turn_idx", df.turn_idx.cast("int"))

    turns = mk(
        [
            ("c1", 0, "user", "hello there", "", t0),
            ("c1", 1, "assistant", "reply text", "", t0 + datetime.timedelta(minutes=1)),
        ],
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    turns.coalesce(1).write.parquet(t_src)
    ann_cols = ["conv_id", "turn_idx", "verdict", "ts"]
    # batch 1: in-bound annotation for turn 0
    mk([("c1", 0, "ok", t0 + datetime.timedelta(minutes=5))], ann_cols
       ).coalesce(1).write.parquet(a_src)
    # batch 2 (separate file): out-of-bound annotation for turn 1
    mk([("c1", 1, "late", t0 + datetime.timedelta(minutes=20))], ann_cols
       ).coalesce(1).write.mode("append").parquet(a_src)

    t_stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(t_src)
    )
    a_stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, verdict string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(a_src)
    )
    q = (
        stream_enrich_join(t_stream, a_stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "enrich join drain did not finish"
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    assert (got[0].turn_idx, got[0].verdict) == (0, "ok")


def test_stream_extract_dedup_end_to_end(spark, tmp_path_factory):
    """Composed pipeline proof: a source that delivers every file TWICE
    still yields exactly-once extracted output, per-turn byte-equal to
    the batch kernel over the unique input."""
    from documentai_ocr_spark.extract import extract_turns
    from documentai_ocr_spark.streaming import stream_extract_dedup

    base = tmp_path_factory.mktemp("e2e")
    src, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ck")
    pdf = synth_transcripts(n_convs=6, seed=11, skew_factor=2)
    df = spark.createDataFrame(pdf)
    df.coalesce(1).write.parquet(src)                 # original delivery
    df.coalesce(1).write.mode("append").parquet(src)  # full replay
    q = stream_extract_dedup(
        spark, src, out, ckpt, max_files_per_trigger=1
    )
    assert q.awaitTermination(180), "composed drain did not finish"
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in spark.read.parquet(f"{out}/extracted").collect()
    }
    want = {
        (r.conv_id, r.turn_idx): r.text
        for r in extract_turns(df.dropDuplicates(
            ["conv_id", "turn_idx"]
        )).collect()
    }
    assert got == want  # exactly once, byte-equal to batch


def test_streaming_simhash_parity_with_batch(spark):
    """The streaming fingerprint kernel must be BIT-IDENTICAL to the
    batch engine's simhash (same per-token md5, same vote rule) — the
    screen and the corpus pass can never disagree about a print."""
    from documentai_ocr_spark.queries.dedup import _simhash_df
    from documentai_ocr_spark.streaming import simhash60_batch

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    rows = docs.collect()
    want = {
        r.doc_id: r.simhash for r in _simhash_df(docs).collect()
    }
    got = simhash60_batch([r.text for r in rows])
    assert {r.doc_id: int(g) for r, g in zip(rows, got)} == want


def test_stream_neardup_screen(spark, tmp_path_factory):
    """Two micro-batches through the stateful band screen: an exact
    copy arriving later must hit ALL 9 of its buckets with hamming 0
    against the original's exemplar; an unrelated doc must produce no
    VERIFIED hit (an accidental band collision shows hamming ~30,
    which the ≤8 rule rejects deterministically)."""
    import time

    import pandas as pd

    from documentai_ocr_spark.streaming import stream_neardup

    d = str(tmp_path_factory.mktemp("neardup") / "in")
    base = "the quick brown fox jumps over the lazy dog " * 20
    other = "entirely different content about spark physical plans " * 20
    third = "a third unrelated payload discussing parquet footers " * 20
    b1 = pd.DataFrame({"doc_id": [1, 2], "text": [base, other]})
    b2 = pd.DataFrame({"doc_id": [3, 4], "text": [base, third]})
    spark.createDataFrame(b1).coalesce(1).write.mode("append").parquet(d)
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(d)

    ckpt = str(tmp_path_factory.mktemp("neardup") / "ckpt")
    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        stream_neardup(src)
        .writeStream.format("memory")
        .queryName("neardup_screen")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "neardup drain did not finish"
    rows = spark.sql("SELECT * FROM neardup_screen").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2, 3, 4}
    assert all(len(v) == 9 for v in by_doc.values())  # 9 bands each

    # the exact copy: every bucket already claimed by doc 1, hamming 0
    hits3 = [r for r in by_doc[3] if r.is_hit]
    assert len(hits3) == 9
    assert all(r.first_doc == 1 and r.hamming == 0 for r in hits3)

    # verified-dup decision rule: hit AND hamming <= 8
    def verified(doc):
        return [r for r in by_doc[doc] if r.is_hit and r.hamming <= 8]

    assert verified(3) and not verified(4) and not verified(2)


def test_streaming_simhash_edge_payloads():
    """Edge payloads through the streaming fingerprint: an empty text
    tokenizes to the single empty token (matching Spark's split('')),
    so its fingerprint IS that token's 60-bit hash (one voter sets
    exactly its own bits); identical texts hash identically."""
    import hashlib

    from documentai_ocr_spark.streaming import simhash60_batch

    got = simhash60_batch(["", "x y", "x y"])
    empty_tok = int(hashlib.md5(b"").hexdigest()[:15], 16)
    assert int(got[0]) == empty_tok
    assert int(got[1]) == int(got[2])


def test_stream_supersede_latest_wins_any_order(spark, tmp_path_factory):
    """Cross-batch latest-wins upsert: retries in later batches
    supersede, stale late arrivals do not, and the final state equals
    the batch (ms, attempt)-max regardless of delivery interleaving —
    the keep rule is order-independent, so micro-batch file order
    cannot change the answer."""
    import pandas as pd

    from documentai_ocr_spark.streaming import stream_supersede

    base = tmp_path_factory.mktemp("stream")
    d = str(base / "in")
    ckpt = str(base / "ckpt")

    # attempt grid over 6 turn keys, spread over 3 files:
    #   originals (attempt 1), fresh retries (higher ms, attempt 2)
    #   for turns 0/2/4, STALE attempts (lower ms, attempt 0) for 1/3
    orig = pd.DataFrame(
        {
            "conv_id": ["c"] * 6,
            "turn_idx": list(range(6)),
            "ms": [1000 + t for t in range(6)],
            "attempt": [1] * 6,
            "text": [f"orig-{t}" for t in range(6)],
        }
    )
    retry = pd.DataFrame(
        {
            "conv_id": ["c"] * 3,
            "turn_idx": [0, 2, 4],
            "ms": [9000, 9002, 9004],
            "attempt": [2] * 3,
            "text": ["retry-0", "retry-2", "retry-4"],
        }
    )
    stale = pd.DataFrame(
        {
            "conv_id": ["c"] * 2,
            "turn_idx": [1, 3],
            "ms": [10, 30],
            "attempt": [0] * 2,
            "text": ["stale-1", "stale-3"],
        }
    )
    schema = (
        "conv_id string, turn_idx int, ms long, attempt int, text string"
    )
    for i, pdf in enumerate([orig, retry, stale]):
        spark.createDataFrame(pdf, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        stream_supersede(src)
        .writeStream.format("memory")
        .queryName("supersede")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "supersede drain did not finish"
    final = {}
    for r in spark.sql("SELECT * FROM supersede").collect():
        final[(r.conv_id, r.turn_idx)] = (
            r.kept_ms,
            r.kept_attempt,
            r.kept_text,
            r.n_attempts,
        )
    # batch truth: (ms, attempt)-lexicographic max per key
    want = {
        ("c", 0): (9000, 2, "retry-0", 2),
        ("c", 1): (1001, 1, "orig-1", 2),
        ("c", 2): (9002, 2, "retry-2", 2),
        ("c", 3): (1003, 1, "orig-3", 2),
        ("c", 4): (9004, 2, "retry-4", 2),
        ("c", 5): (1005, 1, "orig-5", 1),
    }
    assert final == want


def test_stream_context_trim_equals_batch_suffix_rule(spark, tmp_path_factory):
    """Incremental-greedy trim across micro-batches must equal the
    batch longest-suffix rule over the whole history, including the
    oversized-turn edge (a turn bigger than the budget empties the
    window) — and state stays budget-bounded by construction."""
    import pandas as pd

    from documentai_ocr_spark.streaming import stream_context_trim

    base = tmp_path_factory.mktemp("stream")
    d, ckpt = str(base / "in"), str(base / "ckpt")
    budget = 100

    # (batch, conv, turn, tok) — deliveries deliberately OUT OF ORDER:
    # D's turn 0 arrives after turns 1-2 forced a pop (the floor rule
    # must reject it: no suffix reaching back to 0 can fit again), E's
    # turn 0 arrives late but nothing was popped (it must be admitted
    # into the window)
    rows = [
        # conv A: steady growth, history must drop from the front
        *[(t // 3, "A", t, 30) for t in range(6)],   # 180 total
        # conv B: an oversized turn mid-stream, then recovery
        (0, "B", 0, 40), (0, "B", 1, 500), (1, "B", 2, 20),
        (1, "B", 3, 30),
        # conv C: fits entirely
        (0, "C", 0, 10), (1, "C", 1, 20),
        # conv D: 1(60)+2(60) pop 1 in batch 0; late 0(10) in batch 2
        (0, "D", 1, 60), (0, "D", 2, 60), (2, "D", 0, 10),
        # conv E: late 0 with no pop in between — must be admitted
        (0, "E", 1, 20), (2, "E", 0, 10),
    ]
    pdf = pd.DataFrame(
        rows, columns=["batch", "conv_id", "turn_idx", "tok"]
    )
    schema = "conv_id string, turn_idx int, tok int"
    for b in (0, 1, 2):
        chunk = pdf[pdf["batch"] == b].drop(columns=["batch"])
        spark.createDataFrame(chunk, schema=schema).coalesce(
            1
        ).write.mode("append").parquet(d)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        stream_context_trim(src, budget=budget)
        .writeStream.format("memory")
        .queryName("ctx_trim")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "trim drain did not finish"
    final = {}
    for r in spark.sql("SELECT * FROM ctx_trim").collect():
        final[r.conv_id] = (r.kept_docs, r.kept_tokens, r.first_kept)

    def batch_suffix(toks):
        total, kept = 0, []
        for ti, tk in reversed(sorted(toks)):
            if total + tk > budget:
                break
            total += tk
            kept.append(ti)
        return (len(kept), total, min(kept) if kept else None)

    for conv in ("A", "B", "C", "D", "E"):
        toks = [(t, k) for _b, c, t, k in rows if c == conv]
        assert final[conv] == batch_suffix(toks), conv


def test_stream_cms_maintain_exactly_once_and_merge_exact(
    spark, input_dir, tmp_path_factory
):
    """The streaming sketch maintainer: after the drain, the cell-wise
    sum over batch partitions must equal the batch-built full-corpus
    sketch EXACTLY (the merge law, end to end), and replaying a batch's
    sink call (retry after write, before checkpoint commit) must not
    change a single cell — dynamic partition overwrite makes the
    maintenance idempotent."""
    from documentai_ocr_spark.queries.corpusops import cms_build
    from documentai_ocr_spark.streaming import (
        TRANSCRIPT_SCHEMA,
        cms_read_current,
        extract_stream_writer,
        stream_cms_maintain,
    )

    base = tmp_path_factory.mktemp("stream")
    out, ckpt = str(base / "out"), str(base / "ckpt")
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    sink = stream_cms_maintain(spark, out)
    q = (
        extract_stream_writer(src, sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "sketch drain did not finish"

    def cells(df):
        return {(r["d"], r["bucket"]): r["cnt"] for r in df.collect()}

    got = cells(cms_read_current(spark, out))
    full = spark.read.parquet(input_dir)
    tok = full.select(F.explode(F.split("text", " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    want = cells(cms_build(tok, "tok"))
    assert got == want

    # replay one batch: re-invoke the sink with the same batch_id on a
    # subset of the input — the partition overwrites itself
    sink(full.limit(37), 0)
    sink(full.limit(37), 0)
    after = cells(cms_read_current(spark, out))
    del got, want
    # batch 0's partition now holds the replayed subset exactly once;
    # re-deriving the expected total proves no double-count happened
    batches = spark.read.parquet(f"{out}/cms")
    per_batch0 = cells(
        batches.where(F.col("batch_id") == 0).groupBy("d", "bucket").agg(
            F.sum("cnt").alias("cnt")
        )
    )
    tok37 = full.limit(37).select(
        F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    assert per_batch0 == cells(cms_build(tok37, "tok"))
    assert after  # current view still readable and summed


def test_stream_template_detect_cross_batch_and_bounded(
    spark, tmp_path_factory
):
    """Template support accumulates across micro-batches: a canned
    reply reaching min_convs distinct conversations only over SEVERAL
    batches flips to is_template; unique texts never do; n_uses is
    exact; and the support state is capped at min_convs (n_convs_min
    never exceeds it, even at 6 distinct convs)."""
    import pandas as pd

    from documentai_ocr_spark.streaming import stream_template_detect

    base = tmp_path_factory.mktemp("tmplstream")
    d = str(base / "in")
    ckpt = str(base / "ckpt")

    canned = "The tool call FAILED.  Please retry."
    batches = [
        # batch 1: canned in convs a, b (+ a duplicate use in a)
        pd.DataFrame(
            {
                "conv_id": ["a", "a", "b", "a"],
                "text": [canned, canned, canned, "unique one"],
            }
        ),
        # batch 2: canned again in conv a only — support stays 2
        pd.DataFrame({"conv_id": ["a"], "text": [canned]}),
        # batch 3: convs c..f push support past the cap
        pd.DataFrame(
            {
                "conv_id": ["c", "d", "e", "f"],
                "text": [canned] * 4,
            }
        ),
    ]
    schema = "conv_id string, text string"
    for pdf in batches:
        spark.createDataFrame(pdf, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        stream_template_detect(src, min_convs=3)
        .writeStream.format("memory")
        .queryName("tmpl_out")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    import hashlib

    th_canned = hashlib.md5(
        " ".join(canned.lower().split()).encode()
    ).hexdigest()
    # n_uses is monotone per fingerprint HERE (the default 6 h TTL
    # means no eviction can fire inside this test; an eviction resets
    # the counter — see test_stream_template_singleton_ttl_eviction),
    # so the max-n_uses emission IS the final state — no reliance on
    # sink row order
    rows = spark.sql(
        "SELECT * FROM tmpl_out"
    ).collect()
    final = {}
    for r in rows:
        if r.th not in final or r.n_uses > final[r.th].n_uses:
            final[r.th] = r
    got = final[th_canned]
    assert got.is_template
    assert got.n_uses == 8  # 3 + 1 + 4 canned uses
    assert got.n_convs_min == 3  # capped at min_convs, NOT 6
    for r in final.values():
        if r.th != th_canned:
            assert not r.is_template and r.n_convs_min <= 1
    # the canned hash must NOT be a template before batch 3: its
    # first-batch emission (the min-n_uses one — monotone again) has
    # support 2
    first = min(
        (r for r in rows if r.th == th_canned), key=lambda r: r.n_uses
    )
    assert not first.is_template and first.n_convs_min == 2


def test_stream_template_singleton_ttl_eviction(spark, tmp_path_factory):
    """A singleton fingerprint with no reuse inside the TTL is really
    EVICTED (the documented trade-off): after the timeout fires, a
    later use restarts its counter from 1 instead of continuing at 2 —
    while a fingerprint that reached support >= 2 before the same idle
    window keeps its state (no timeout is ever registered for it)."""
    import time

    import pandas as pd

    from documentai_ocr_spark.streaming import stream_template_detect

    base = tmp_path_factory.mktemp("tmplttl")
    d = str(base / "in")
    ckpt = str(base / "ckpt")
    schema = "conv_id string, text string"
    lone = "rare reply seen once."
    kept = "promoted reply."

    def write_batch(pdf):
        spark.createDataFrame(pdf, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    def wait_rows(n, deadline=60):
        t0 = time.time()
        while time.time() - t0 < deadline:
            if spark.sql("SELECT * FROM tmpl_ttl_out").count() >= n:
                return
            time.sleep(0.5)
        raise AssertionError(f"sink never reached {n} rows")

    # batch 1: lone is a singleton (gets the 500 ms TTL); kept reaches
    # support 2 (never expires). ONE continuous query — memory sinks
    # cannot recover a checkpoint, and the TTL must lapse between
    # micro-batches of the same run.
    write_batch(
        pd.DataFrame(
            {"conv_id": ["a", "x", "y"], "text": [lone, kept, kept]}
        )
    )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 10)
        .parquet(d)
    )
    q = (
        stream_template_detect(src, min_convs=3, singleton_ttl_ms=500)
        .writeStream.format("memory")
        .queryName("tmpl_ttl_out")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        wait_rows(2)  # batch 1 emitted lone(1) + kept(2)
        time.sleep(2)  # let the singleton TTL lapse
        # batch 2: unrelated traffic guarantees a micro-batch runs with
        # the deadline passed — the timeout fires and evicts lone's
        # state silently (no emission)
        write_batch(pd.DataFrame({"conv_id": ["z"], "text": ["noise."]}))
        wait_rows(3)
        # batch 3: lone returns (restarts at 1); kept continues (3)
        write_batch(
            pd.DataFrame({"conv_id": ["b", "x"], "text": [lone, kept]})
        )
        wait_rows(5)
    finally:
        q.stop()

    import hashlib

    def th(s):
        return hashlib.md5(" ".join(s.lower().split()).encode()).hexdigest()

    rows = spark.sql("SELECT * FROM tmpl_ttl_out").collect()
    lone_uses = sorted(r.n_uses for r in rows if r.th == th(lone))
    kept_uses = sorted(r.n_uses for r in rows if r.th == th(kept))
    # evicted: second appearance restarted at 1 — NOT [1, 2]
    assert lone_uses == [1, 1], lone_uses
    # promoted at support 2: state survived the same idle window
    assert kept_uses == [2, 3], kept_uses


def test_stream_hll_dau_exactly_once_and_merge(spark, tmp_path_factory):
    """The streaming DAU maintainer: after the drain, the MAX-merged
    register estimate matches the exact per-day distinct (linear-
    counting regime at this cardinality → exact); replaying a batch's
    sink call leaves every register untouched (dynamic overwrite); and
    re-delivering the SAME data under a NEW batch_id also cannot move
    the merged sketch — MAX is idempotent, a strictly stronger replay
    property than the CMS sum."""
    from documentai_ocr_spark.streaming import (
        extract_stream_writer,
        hll_dau_read_current,
        stream_hll_dau,
    )

    base = tmp_path_factory.mktemp("hlldau")
    ind, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(5).write.parquet(ind)

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(ind)
    )
    sink = stream_hll_dau(spark, out)
    q = (
        extract_stream_writer(src, sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "DAU drain did not finish"

    def snapshot():
        return {
            r["day"]: r["dau_est"]
            for r in hll_dau_read_current(spark, out).collect()
        }

    got = snapshot()
    day = F.expr(
        "cast(unix_millis(cast(ts as timestamp)) div 86400000 as bigint)"
    )
    exact = {
        r["day"]: r["n"]
        for r in ev.select(day.alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exact  # tiny per-day cardinality ⇒ linear counting

    # retry batch 0: dynamic overwrite replaces ITS partition; writing
    # the full corpus there makes that partition the merged maximum,
    # so the merged sketch cannot move
    sink(ev, 0)
    assert snapshot() == got
    # duplicate delivery under a NEW batch id: MAX-merge idempotent —
    # re-delivered registers are dominated by what is already there
    sink(ev, 999)
    assert snapshot() == got


def test_stream_quantile_sketch_exactly_once_and_merge_exact(
    spark, tmp_path_factory
):
    """The streaming quantile maintainer: after the drain, the
    SUM-merged per-day p50/p90/p99 equal the batch-built whole-corpus
    sketch readout EXACTLY (merge law end to end — and each estimate
    is the bucket of the exact order statistic of the day's cent
    values); replaying a batch's sink call under its own batch_id
    replaces the partition instead of double-counting."""
    from documentai_ocr_spark.queries.corpusops import (
        qsketch_quantiles,
        qsketch_rows,
    )
    from documentai_ocr_spark.streaming import (
        extract_stream_writer,
        quantile_read_current,
        stream_quantile_sketch,
    )

    base = tmp_path_factory.mktemp("qsk")
    ind, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(5).write.parquet(ind)

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(ind)
    )
    sink = stream_quantile_sketch(spark, out)
    q = (
        extract_stream_writer(src, sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "quantile drain did not finish"

    def snap(df):
        return {
            r["day"]: (r["n_tot"], r["p50_est"], r["p90_est"], r["p99_est"])
            for r in df.collect()
        }

    got = snap(quantile_read_current(spark, out))
    e = ev.select(
        F.expr(
            "cast(unix_millis(cast(ts as timestamp)) div 86400000"
            " as bigint)"
        ).alias("day"),
        F.expr("cast(floor(value * 100) as bigint)").alias("vc"),
    )
    want = snap(qsketch_quantiles(qsketch_rows(e, "vc", ["day"]), ["day"]))
    assert got == want and len(got) > 0

    # the estimates really are the exact order statistics' buckets
    import pandas as pd

    pev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    day = pev["ts"].astype("int64") // 1000 // 86400000
    per: dict[int, list] = {}
    for d, v in zip(day, pev["value"]):
        import math

        per.setdefault(int(d), []).append(int(math.floor(v * 100)))

    def bucket(v):
        s = str(v)
        return v if len(s) <= 3 else int(s[:3] + "0" * (len(s) - 3))

    for d, vals in per.items():
        vals.sort()
        n = len(vals)
        for q100, est in zip((50, 90, 99), got[d][1:]):
            assert est == bucket(vals[(q100 * n + 99) // 100 - 1]), d

    # retry: re-invoking the sink twice with the same batch_id leaves
    # exactly one copy of that subset in the partition
    sink(ev.limit(41), 0)
    sink(ev.limit(41), 0)
    batches = spark.read.parquet(f"{out}/qsk")
    per0 = {
        (r["day"], r["bucket"]): r["n"]
        for r in batches.where(F.col("batch_id") == 0)
        .groupBy("day", "bucket")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    e41 = ev.limit(41).select(
        F.expr(
            "cast(unix_millis(cast(ts as timestamp)) div 86400000"
            " as bigint)"
        ).alias("day"),
        F.expr("cast(floor(value * 100) as bigint)").alias("vc"),
    )
    want41 = {
        (r["day"], r["bucket"]): r["n"]
        for r in qsketch_rows(e41, "vc", ["day"]).collect()
    }
    assert per0 == want41


def test_stream_slo_burn_parity_and_replace_only(spark, tmp_path_factory):
    """The streaming burn maintainer: after an availableNow drain of
    the sf0.001 event stream, slo_burn_read_current equals the batch
    q_slo_burn row-for-row (shared slo_burn_from_daily readout over
    SUM-merged partials — the merge-law proof end to end); retrying a
    batch under its own batch_id replaces the partition instead of
    double-counting."""
    from documentai_ocr_spark.queries.relational import q_slo_burn
    from documentai_ocr_spark.streaming import (
        extract_stream_writer,
        slo_burn_read_current,
        stream_slo_burn,
    )

    base = tmp_path_factory.mktemp("slo")
    ind, out, ckpt = str(base / "in"), str(base / "out"), str(base / "ckpt")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(5).write.parquet(ind)

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(ind)
    )
    sink = stream_slo_burn(spark, out)
    q = (
        extract_stream_writer(src, sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "slo drain did not finish"

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    got = snap(slo_burn_read_current(spark, out))
    want = snap(q_slo_burn(spark, "/root/testdata/sf0.001"))
    assert got == want and len(got) > 0

    # retry: same batch_id twice → exactly one copy of that subset
    sink(ev.limit(37), 0)
    sink(ev.limit(37), 0)
    per0 = {
        r["day"]: (r["total"], r["err"])
        for r in spark.read.parquet(f"{out}/slo")
        .where(F.col("batch_id") == 0)
        .groupBy("day")
        .agg(
            F.sum("total").cast("long").alias("total"),
            F.sum("err").cast("long").alias("err"),
        )
        .collect()
    }
    sub = (
        ev.limit(37)
        .select(
            F.expr(
                "cast(unix_millis(cast(ts as timestamp)) div 86400000"
                " as bigint)"
            ).alias("day"),
            (F.col("event_type") == "error").cast("long").alias("iserr"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total"),
            F.sum("iserr").cast("long").alias("err"),
        )
    )
    want0 = {
        r["day"]: (r["total"], r["err"]) for r in sub.collect()
    }
    assert per0 == want0


def test_stream_activity_bitmap_rebase_any_order(spark, tmp_path_factory):
    """Incremental bitmap maintenance across micro-batches equals the
    batch first-64-days semantics REGARDLESS of delivery order — the
    hostile file arrives LAST carrying the EARLIEST day, forcing the
    re-base shift; a day ≥64 after the true base contributes nothing;
    day 63 lands on the sign bit and must round-trip the signed-bigint
    state intact."""
    import pandas as pd

    from documentai_ocr_spark.streaming import stream_activity_bitmap

    base = tmp_path_factory.mktemp("stream")
    d = str(base / "in")
    ckpt = str(base / "ckpt")

    # user 1: delivered days 50, 7, 113, then LATE arrival day 0
    #   → true base 0, active {0, 7, 50, 63←not set: 113-0 ≥ 64? 113
    #   drops; wait 63 comes from user 2}. After rebase: {0, 7, 50},
    #   the pre-rebase bits shift left by 50.
    # user 2: days 63 then 0 → after rebase {0, 63}: sign bit set.
    batches = [
        pd.DataFrame({"user_id": [1, 1], "day": [50, 7]}),
        pd.DataFrame({"user_id": [1, 2], "day": [113, 63]}),
        pd.DataFrame({"user_id": [1, 2], "day": [0, 0]}),
    ]
    schema = "user_id long, day long"
    for pdf in batches:
        spark.createDataFrame(pdf, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    q = (
        stream_activity_bitmap(src)
        .writeStream.format("memory")
        .queryName("bitmap")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "bitmap drain did not finish"
    final = {}
    for r in spark.sql("SELECT * FROM bitmap").collect():
        final[r.user_id] = (r.base_day, r.mask, r.n_active_64)

    def batch_ref(days):
        b = min(days)
        m = 0
        for day in days:
            if day - b < 64:
                m |= 1 << (day - b)
        return (b, m - (1 << 64) if m >= (1 << 63) else m,
                bin(m).count("1"))

    assert final[1] == batch_ref([50, 7, 113, 0])
    assert final[2] == batch_ref([63, 0])
    # the engineered facts the test exists for:
    assert final[1][2] == 3          # day 113 dropped by the horizon
    assert final[2][1] < 0           # sign bit set (day 63)
