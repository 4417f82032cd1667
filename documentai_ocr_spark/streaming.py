"""Structured Streaming front-end for the extraction pipeline.

The reference's closest streaming analogue is a poll-drain work queue
(/root/reference/ocrclient/pdocr.py:70-101: ``while find(flag==0): …
sleep(10)``). SURVEY.md §2.9 maps that to batch-incremental runs
(lineage.py). This module adds the true streaming flavor for arriving
data: ``readStream`` on a file source → the SAME extract_turns kernel →
``foreachBatch`` append with per-batch lineage. Exactly-once comes from
the streaming checkpoint (source offsets) + idempotent batch ids.

There is no event-time logic in the reference (no watermarks needed for
parity); ``windowed_turn_counts`` below shows the watermarked windowed
aggregation shape for completeness, keyed on the transcript ``ts``.

Scale notes: the hot path is identical to batch (one narrow Arrow
stage); the streaming layer only adds offset tracking. maxFilesPerTrigger
bounds batch size; on a real cluster the source is Kafka or an Iceberg
incremental read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import extract_turns

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def make_sink(spark: SparkSession, output_dir: str):
    """Build the idempotent foreachBatch sink.

    Exactly-once discipline: both outputs are partitioned by ``batch_id``
    and written with DYNAMIC partition overwrite, so a micro-batch that
    is retried after a successful write but before the checkpoint commit
    simply overwrites its own partition — a plain ``append`` would
    duplicate it. Lineage metrics are aggregated from the in-memory batch
    (persisted for the two actions), never by re-reading the output
    directory: the old full-rescan pattern was O(total output) IO per
    batch, growing without bound over a run."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ext = extract_turns(batch_df).withColumn(
            "batch_id", F.lit(int(batch_id)).cast("long")
        )
        ext.persist()
        try:
            stats = ext.agg(
                F.count(F.lit(1)).cast("long").alias("n_turns"),
                F.coalesce(F.sum("n_spans"), F.lit(0))
                .cast("long")
                .alias("n_spans"),
            ).collect()[0]
            (
                ext.write.mode("overwrite")
                .partitionBy("batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(f"{output_dir}/extracted")
            )
            (
                spark.createDataFrame(
                    [(int(batch_id), stats["n_turns"], stats["n_spans"])],
                    "batch_id long, n_turns long, n_spans long",
                )
                .coalesce(1)
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(f"{output_dir}/lineage")
            )
        finally:
            ext.unpersist()

    return sink


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
):
    """Start (availableNow) a streaming extraction: each micro-batch runs
    the batch kernel and idempotently writes results + one lineage row
    per batch (see :func:`make_sink`). Returns the StreamingQuery;
    callers awaitTermination()."""
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    return (
        extract_stream_writer(src, make_sink(spark, output_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def extract_stream_writer(src: DataFrame, sink):
    return src.writeStream.foreachBatch(sink)


CONV_STATE_SCHEMA = "n_turns long, n_chars long, max_turn int"
CONV_PROGRESS_SCHEMA = "conv_id string, n_turns long, n_chars long, max_turn int"


def stateful_conv_progress(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-conversation progress (turn count, char volume, high-water
    turn_idx) maintained across micro-batches. This is the streaming
    form of the reference's incremental per-key accumulation (the Redis
    counters of /root/reference/ocrclient/redisdata.py:145-156) — state
    lives in the streaming state store, survives restarts via the
    checkpoint, and each batch emits one updated row per touched
    conversation (Update mode).

    Scale: state is 3 numbers per conv_id; the operator shuffles each
    micro-batch once on conv_id (the same key the table is bucketed by,
    so a Kafka-partitioned source arrives pre-grouped)."""
    import pandas as pd  # noqa: F401 (worker-side import)

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            n_turns, n_chars, max_turn = state.get
        else:
            n_turns, n_chars, max_turn = 0, 0, -1
        for pdf in pdfs:
            n_turns += len(pdf)
            n_chars += int(pdf["text"].fillna("").str.len().sum())
            if len(pdf):
                max_turn = max(max_turn, int(pdf["turn_idx"].max()))
        state.update((n_turns, n_chars, max_turn))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "n_turns": [n_turns],
                "n_chars": [n_chars],
                "max_turn": [max_turn],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            update,
            outputStructType=CONV_PROGRESS_SCHEMA,
            stateStructType=CONV_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_turn_counts(
    stream: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked event-time windowed aggregation over a transcript
    stream: turns and conversations per window (the late-data-safe
    metrics feed)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "n_turns",
            "n_convs",
        )
    )


def stream_dedup(
    stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Cross-micro-batch exact dedup on a transcript stream: the FIRST
    arrival of each (conv_id, turn_idx) passes, any replay within the
    event-time watermark is dropped from the streaming state store —
    the ingest-side guard against at-least-once sources (Kafka
    redelivery, backfill overlap). ``dropDuplicatesWithinWatermark``
    bounds state: keys older than the watermark are evicted, so state
    size tracks the late-data horizon, not the stream's lifetime (an
    unbounded ``dropDuplicates`` would OOM a 10^12-turn stream).
    Streaming analogue of the batch insert-if-absent idempotence
    (/root/reference/ocrclient/redisdata.py:106-108)."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def stream_sessionize(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming gap-based sessionization via ``session_window``: the
    event-time analogue of the batch islands operator (q_sessionize) —
    a session is a run of turns for one conversation with no gap
    larger than ``gap``. Unlike the batch form (lag + cumulative sum,
    which needs the whole history ordered), the streaming state store
    keeps only OPEN sessions; the watermark closes and emits a session
    once no on-time row can extend it, so state is bounded by the
    number of concurrently live conversations, not the stream length.

    Scale: one shuffle per micro-batch on conv_id (same key as the
    table bucketing, so a Kafka/Iceberg source arrives pre-grouped);
    session merge (two state entries bridged by a late-but-on-time row)
    is handled by the engine's session-merging state format."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id", F.session_window("ts", gap))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
        )
        .select(
            "conv_id",
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            "n_turns",
            "n_chars",
        )
    )


def stream_enrich_join(
    turns: DataFrame,
    annotations: DataFrame,
    bound: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: enrich a live turn stream
    with an asynchronous annotation stream (model verdicts, labels)
    keyed by (conv_id, turn_idx), accepting an annotation only within
    ``bound`` AFTER the turn's own event time. This is the streaming
    analogue of the batch rescue join (q_lang_id's left-outer) for the
    case where BOTH sides arrive incrementally — the reference's
    poll-loop join of OCR results onto pending work items
    (/root/reference/ocrclient/redisdata.py:60-88) re-expressed as
    Structured Streaming's state-store join.

    State bounds (the at-scale contract): each side is watermarked, and
    the time-range predicate lets the engine evict a buffered turn once
    the annotation watermark passes ``turn ts + bound`` (and vice
    versa) — without the range condition the join state would grow with
    the stream's lifetime, which at 10^12 turns is an OOM, not a join.
    The equi-key (conv_id, turn_idx) keeps the state-store shuffle
    hash-partitioned exactly like the table bucketing."""
    t = turns.selectExpr(
        "conv_id", "turn_idx", "text", "ts AS turn_ts"
    ).withWatermark("turn_ts", watermark)
    a = annotations.selectExpr(
        "conv_id", "turn_idx", "verdict", "ts AS ann_ts"
    ).withWatermark("ann_ts", watermark)
    return t.join(
        a,
        [
            t.conv_id == a.conv_id,
            t.turn_idx == a.turn_idx,
            a.ann_ts >= t.turn_ts,
            a.ann_ts <= t.turn_ts + F.expr(f"INTERVAL {bound}"),
        ],
        "inner",
    ).select(
        t.conv_id,
        t.turn_idx,
        "text",
        "verdict",
        "turn_ts",
        "ann_ts",
    )


def stream_extract_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
    watermark: str = "1 hour",
):
    """The composed ingest front door: at-least-once source →
    cross-batch dedup (dropDuplicatesWithinWatermark on (conv_id,
    turn_idx)) → per-batch extraction → idempotent sink. The guarantee
    stack: the dedup state kills replays the source delivers twice, the
    sink's batch-id idempotence kills replays the ENGINE delivers twice
    (retry after sink success but before checkpoint commit) — together,
    exactly-once extracted output over an at-least-once stream."""
    src = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    deduped = stream_dedup(src, watermark=watermark)
    return (
        extract_stream_writer(deduped, make_sink(spark, output_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ------------------------------------------------- streaming near-dup
# The banded-simhash dedup screen at the streaming front door: each
# incoming document is fingerprinted IN-BATCH (no shuffle), exploded
# into its 9 pigeonhole band keys, and checked against the state
# store's bucket exemplars — the streaming analogue of the batch
# simhash_pairs_banded equi-join, with state instead of a corpus scan.
_SIMHASH_BITS = 60
_TOKEN_HASH_CACHE: dict = {}
_TOKEN_HASH_CACHE_MAX = 1 << 20


def _tok60(tok: str) -> int:
    """First 60 bits of md5(token) — the same per-token hash the batch
    fingerprint uses (dedup._hex60), with a per-worker cache: corpus
    vocabulary is Zipfian, so the digest cost amortizes across batches
    (the model-singleton pattern applied to a hash table)."""
    v = _TOKEN_HASH_CACHE.get(tok)
    if v is None:
        import hashlib

        v = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        if len(_TOKEN_HASH_CACHE) < _TOKEN_HASH_CACHE_MAX:
            _TOKEN_HASH_CACHE[tok] = v
    return v


def simhash60_batch(texts) -> "np.ndarray":  # noqa: F821
    """Vectorized-in-batch 60-bit simhash, BIT-IDENTICAL to the batch
    engine's fingerprint (dedup._simhash_df — parity pinned in
    tests/test_streaming.py): token weights via np.unique, per-bit
    votes as a U×60 matrix reduction, bit set iff the weighted vote is
    strictly positive. The only Python-level loop is per DOCUMENT (and
    per distinct-token digest on cache miss), never per output row."""
    import numpy as np

    shifts = np.arange(_SIMHASH_BITS, dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = np.array((t or "").split(" "), dtype=object)
        uniq, w = np.unique(toks, return_counts=True)
        hv = np.fromiter(
            (_tok60(x) for x in uniq), dtype=np.int64, count=len(uniq)
        )
        bits = (hv[:, None] >> shifts) & 1
        votes = ((2 * bits - 1) * w[:, None].astype(np.int64)).sum(axis=0)
        out[i] = int(((votes > 0).astype(np.int64) << shifts).sum())
    return out


NEARDUP_OUT_SCHEMA = (
    "doc_id long, seg int, seg_val long, is_hit boolean, "
    "first_doc long, hamming int"
)
NEARDUP_STATE_SCHEMA = "first_doc long, first_simhash long"


def stream_neardup(stream: DataFrame) -> DataFrame:
    """Streaming near-dup candidate screen + in-operator verification.

    Pipeline: per-batch vectorized simhash (narrow — no shuffle) →
    explode into the 9 pigeonhole band keys (hamming ≤ 8 ⇒ at least
    one shared band, the same guarantee the batch equi-join carries) →
    ``applyInPandasWithState`` keyed on (seg, seg_val). State per
    bucket is ONE exemplar: (first_doc, first_simhash) — two longs.
    Every row is emitted with ``is_hit`` (bucket already claimed) and
    the exact ``hamming`` distance to the exemplar, so the consumer's
    decision rule is deterministic: near-dup ⟺ any hit with
    hamming ≤ 8 (random 60-bit fingerprints sit near hamming ~30 —
    an accidental band collision cannot fake a verified dup).

    Scale & honesty: one micro-batch shuffle on the band key; state is
    O(distinct buckets) × 16 bytes. The exemplar approximation means a
    doc is verified against its bucket's FIRST claimant only — the
    overwhelmingly common case for dedup screening; the batch banded
    join (simhash_pairs_banded) remains the exact path for full-corpus
    passes, and this screen's fingerprint is bit-identical to it."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    from .queries.simsearch import simhash_band_segments

    @F.pandas_udf("long")
    def sh(texts):
        return pd.Series(simhash60_batch(texts.tolist()))

    # null-text rows are dropped, matching the batch fingerprint exactly
    # (dedup._tok_counts' explode(split(null)) yields no rows there; the
    # kernel would otherwise fingerprint None as the empty string)
    fp = stream.where(F.col("text").isNotNull()).select(
        "doc_id", sh(F.col("text")).alias("simhash")
    )
    bands = simhash_band_segments(fp, hamming_max=8)

    def update(key, pdfs, state):
        if state.hasTimedOut:  # pragma: no cover — TTL path
            state.remove()
            return
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        if state.exists:
            first_doc, first_sh = state.get
        else:
            j = int(pdf["doc_id"].idxmin())
            first_doc = int(pdf["doc_id"].min())
            first_sh = int(pdf["simhash"].iloc[j])
            state.update((first_doc, first_sh))
        import numpy as np

        x = pdf["simhash"].to_numpy().astype("int64") ^ first_sh
        # vectorized popcount: big-endian byte view → unpackbits → sum
        ham = (
            np.unpackbits(
                x.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
            )
            .sum(axis=1)
            .astype("int32")
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "seg": pdf["seg"],
                "seg_val": pdf["seg_val"],
                "is_hit": pdf["doc_id"] != first_doc,
                "first_doc": first_doc,
                "hamming": ham,
            }
        )

    return bands.groupBy("seg", "seg_val").applyInPandasWithState(
        update,
        outputStructType=NEARDUP_OUT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------- streaming upsert
SUPERSEDE_STATE_SCHEMA = (
    "kept_ms long, kept_attempt int, kept_text string, n_attempts long"
)
SUPERSEDE_OUT_SCHEMA = (
    "conv_id string, turn_idx int, kept_ms long, kept_attempt int, "
    "kept_text string, n_attempts long"
)


def stream_supersede(stream: DataFrame) -> DataFrame:
    """Streaming latest-wins turn upsert — the streaming twin of
    q_turn_supersede (queries/relational.py): a regenerated/edited turn
    arriving in ANY later micro-batch replaces its predecessor, a stale
    attempt arriving late does NOT. State per (conv_id, turn_idx) is the
    winning attempt's (ms, attempt, payload) plus an attempt counter;
    each batch emits the key's current winner (Update mode), so a
    downstream MERGE sink materializes the resolved transcript.

    The keep rule is the batch query's exact ordering — (ms, attempt)
    lexicographic max — which is ORDER-INDEPENDENT across deliveries:
    any arrival interleaving converges to the same state (the property
    the cross-batch test pins).

    Scale: state is one turn's payload per turn key (the finest key in
    the table — no conversation or source ever groups); each micro-batch
    shuffles once on the turn key.

    Expected input columns: conv_id, turn_idx, ms (long), attempt (int),
    text."""
    import pandas as pd  # noqa: F401 (worker-side import)

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            kept_ms, kept_attempt, kept_text, n_attempts = state.get
        else:
            kept_ms, kept_attempt, kept_text, n_attempts = -1, -1, None, 0
        for pdf in pdfs:
            n_attempts += len(pdf)
            for ms, att, txt in zip(
                pdf["ms"], pdf["attempt"], pdf["text"]
            ):
                if (int(ms), int(att)) > (kept_ms, kept_attempt):
                    kept_ms, kept_attempt = int(ms), int(att)
                    kept_text = None if txt is None else str(txt)
        state.update((kept_ms, kept_attempt, kept_text, n_attempts))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "turn_idx": [key[1]],
                "kept_ms": [kept_ms],
                "kept_attempt": [kept_attempt],
                "kept_text": [kept_text],
                "n_attempts": [n_attempts],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("conv_id", "turn_idx").applyInPandasWithState(
        update,
        outputStructType=SUPERSEDE_OUT_SCHEMA,
        stateStructType=SUPERSEDE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------ streaming context trim
TRIM_STATE_SCHEMA = (
    "idxs array<int>, toks array<int>, total long, floor int"
)
TRIM_OUT_SCHEMA = (
    "conv_id string, kept_docs long, kept_tokens long, first_kept int"
)


def stream_context_trim(stream: DataFrame, budget: int = 256) -> DataFrame:
    """Streaming longest-suffix context trim — the serving-side twin of
    q_context_trim (queries/corpusops.py): keep the longest (by turn
    order) suffix whose token total fits the budget, dropping history
    from the front. ORDER-INDEPENDENT like stream_supersede: arrivals
    insert in turn order, and a ``floor`` (the highest turn index ever
    popped) rejects stragglers that can no longer matter — when a turn
    f is popped, the set of already-seen turns newer than f exceeded
    the budget, and later arrivals only ADD to any suffix containing f,
    so no suffix reaching back to f can ever fit again; turns above the
    floor are all retained, so the state is exactly the full delivered
    set restricted to > floor and the greedy front-pop equals the batch
    rule on the full set, whatever the interleaving (a single turn
    larger than the whole budget pops itself — kept=0, the batch edge).

    State per conversation is BOUNDED BY THE BUDGET (at most budget+1
    turn entries), not by conversation length — the property that lets
    a serving fleet hold every open conversation's window in memory.

    Expected input columns: conv_id, turn_idx (int), tok (int) — turn
    keys unique (resolve retries with stream_supersede upstream)."""
    import pandas as pd  # noqa: F401 (worker-side import)

    def update(key, pdfs, state):
        import bisect

        import pandas as pd

        if state.exists:
            idxs, toks, total, floor = state.get
            idxs, toks = list(idxs), list(toks)
        else:
            idxs, toks, total, floor = [], [], 0, -1
        for pdf in pdfs:
            for ti, tk in sorted(zip(pdf["turn_idx"], pdf["tok"])):
                ti, tk = int(ti), int(tk)
                if ti <= floor:
                    continue  # provably outside every feasible suffix
                pos = bisect.bisect_left(idxs, ti)
                idxs.insert(pos, ti)
                toks.insert(pos, tk)
                total += tk
                while total > budget and idxs:
                    floor = max(floor, idxs[0])
                    total -= toks.pop(0)
                    idxs.pop(0)
        state.update((idxs, toks, total, floor))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "kept_docs": [len(idxs)],
                "kept_tokens": [total],
                "first_kept": [idxs[0] if idxs else None],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=TRIM_OUT_SCHEMA,
        stateStructType=TRIM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -------------------------------------------- streaming sketch maintainer
def stream_cms_maintain(spark: SparkSession, output_dir: str):
    """Exactly-once streaming frequency-sketch maintenance — the
    merge-law tests (tests/test_corpusops.py) made operational: each
    micro-batch builds its OWN count-min sketch (fixed depth×width
    cells regardless of batch size) and writes it under its batch_id
    partition with dynamic overwrite, so a retried batch replaces
    itself instead of double-counting; the CURRENT corpus sketch is the
    cell-wise sum over batch partitions (cms_read_current), exact by
    the merge law. No history is ever re-scanned: per-batch work is one
    batch-sized groupBy + a ≤ depth×width-row write.

    Returns the foreachBatch sink (expects a text column named
    ``text``)."""
    from .queries.corpusops import cms_build

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        tok = batch_df.select(
            F.explode(F.split("text", " ")).alias("tok")
        ).where(F.col("tok") != "")
        (
            cms_build(tok, "tok")
            .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
            .coalesce(1)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{output_dir}/cms")
        )

    return sink


def cms_read_current(spark: SparkSession, output_dir: str) -> DataFrame:
    """The corpus-wide sketch as of now: cell-wise sum of the per-batch
    sketches (≤ depth×width rows per batch — the scan is
    O(batches·cells), never O(corpus))."""
    return (
        spark.read.parquet(f"{output_dir}/cms")
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


# ------------------------------------------- streaming template monitor
TEMPLATE_STATE_SCHEMA = "n_uses long, convs array<string>"
TEMPLATE_OUT_SCHEMA = (
    "th string, n_uses long, n_convs_min int, is_template boolean"
)


def stream_template_detect(
    stream: DataFrame,
    min_convs: int = 3,
    singleton_ttl_ms: int = 6 * 3600 * 1000,
) -> DataFrame:
    """Streaming canned-reply monitor — the streaming twin of
    q_template_turns (queries/corpusops.py): normalized-turn
    fingerprints accumulate use counts and conversation support across
    micro-batches; a fingerprint becomes a template the moment
    ``min_convs`` DISTINCT conversations have used it.

    State per fingerprint is BOUNDED BY DESIGN: the distinct-conv set
    is capped at ``min_convs`` entries — exactly enough to decide
    templatehood — so a template used by 10^9 conversations holds
    ``min_convs`` conv ids and two counters, never the support set.
    The KEY COUNT is bounded too: most fingerprints in a real stream
    are singletons (unique turns — the long tail the batch twin's
    HAVING prunes), so single-conversation keys carry a processing-time
    timeout of ``singleton_ttl_ms`` and are EVICTED if no reuse
    arrives in that window (a later use restarts them from zero — the
    documented trade-off of any evicting monitor); keys with support
    >= 2 — the plausible template candidates, a vastly smaller set —
    never expire.
    ``n_convs_min`` is therefore exact below the cap and pinned at the
    cap above it (the emitted ``is_template`` is always exact). The
    capped-set rule is ORDER-INDEPENDENT: set membership is insertion-
    order-blind until the cap, and once full every interleaving has
    already crossed the threshold.

    The fingerprint itself (queries.corpusops.template_hash) is applied
    as a vectorized expression BEFORE the stateful operator — the only
    Python is the per-fingerprint state fold. Each micro-batch shuffles
    once on the fingerprint key.

    Expected input columns: conv_id, text."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .queries.corpusops import template_hash

    keyed = stream.select(
        template_hash(F.col("text")).alias("th"), "conv_id"
    )

    def update(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            # singleton fingerprint with no reuse inside the TTL —
            # drop the state entry, emit nothing
            state.remove()
            return
        if state.exists:
            n_uses, convs = state.get
            convs = list(convs)
        else:
            n_uses, convs = 0, []
        seen = set(convs)
        for pdf in pdfs:
            n_uses += len(pdf)
            if len(seen) < min_convs:
                for c in pdf["conv_id"]:
                    # coerce BEFORE the membership test: state stores
                    # strings, so testing the raw value (e.g. int64)
                    # would always miss and rely on the set's dedup
                    c = str(c)
                    if c not in seen:
                        seen.add(c)
                        if len(seen) >= min_convs:
                            break
        convs = sorted(seen)[:min_convs]
        state.update((n_uses, convs))
        if len(convs) < 2:
            state.setTimeoutDuration(singleton_ttl_ms)
        yield pd.DataFrame(
            {
                "th": [key[0]],
                "n_uses": [n_uses],
                "n_convs_min": [len(convs)],
                "is_template": [len(convs) >= min_convs],
            }
        )

    return keyed.groupBy("th").applyInPandasWithState(
        update,
        outputStructType=TEMPLATE_OUT_SCHEMA,
        stateStructType=TEMPLATE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ------------------------------------------- streaming DAU maintainer
def stream_hll_dau(spark: SparkSession, output_dir: str):
    """Exactly-once streaming daily-active-users maintenance on
    MERGEABLE HLL register rows (corpusops.hll_registers): each
    micro-batch reduces to ≤ days×m register rows written under its
    batch_id partition with dynamic overwrite — a retried batch
    replaces itself, and because the register merge law is MAX
    (idempotent), even a double-WRITTEN batch cannot move the merged
    sketch. The current per-day DAU estimate is hll_dau_read_current:
    one MAX-merge over O(batches × days × m) register rows, never a
    rescan of the event stream. Day index is the physical-epoch-ms
    integer rule shared with q_dau_wau / q_hour_mix.

    Returns the foreachBatch sink (expects ``ts`` and ``user_id``)."""
    from .queries.corpusops import hll_registers

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        e = batch_df.select(
            F.expr(
                "cast(unix_millis(cast(ts as timestamp)) div 86400000"
                " as bigint)"
            ).alias("day"),
            F.col("user_id").cast("string").alias("uid"),
        )
        (
            hll_registers(e, "uid", ["day"])
            .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
            .coalesce(1)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{output_dir}/hll_dau")
        )

    return sink


def hll_dau_read_current(spark: SparkSession, output_dir: str) -> DataFrame:
    """Per-day DAU estimate as of now: MAX-merge the per-batch register
    rows, then the HLL estimator (corpusops.hll_estimate)."""
    from .queries.corpusops import hll_estimate

    regs = spark.read.parquet(f"{output_dir}/hll_dau")
    return hll_estimate(regs, ["day"]).withColumnRenamed(
        "hll_est", "dau_est"
    )


# --------------------------------------- streaming quantile maintainer
def stream_quantile_sketch(spark: SparkSession, output_dir: str):
    """Exactly-once streaming per-day VALUE-QUANTILE maintenance on the
    mergeable 3-significant-digit sketch rows (corpusops.qsketch_rows):
    each micro-batch reduces to its ≤ days × buckets sketch rows and
    writes them under its batch_id partition with dynamic overwrite —
    a retried batch replaces itself (the CMS replace-only guarantee;
    the merge law is SUM, so unlike the HLL MAX a double-delivery
    under a NEW batch id would double-count — exactly-once comes from
    the checkpointed batch_id, not from idempotent algebra). The
    current per-day p50/p90/p99 is quantile_read_current: SUM-merge
    the batch partitions, then the shared inverted-CDF readout —
    never a rescan of the stream. Values enter as non-negative
    integer cents (floor(value·100)); day is the physical-epoch-ms
    rule shared with q_dau_wau.

    Returns the foreachBatch sink (expects ``ts`` and ``value``)."""
    from .queries.corpusops import qsketch_rows

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        e = batch_df.select(
            F.expr(
                "cast(unix_millis(cast(ts as timestamp)) div 86400000"
                " as bigint)"
            ).alias("day"),
            F.expr("cast(floor(value * 100) as bigint)").alias("vc"),
        )
        (
            qsketch_rows(e, "vc", ["day"])
            .withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
            .coalesce(1)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{output_dir}/qsk")
        )

    return sink


def quantile_read_current(
    spark: SparkSession, output_dir: str
) -> DataFrame:
    """Per-day value percentiles as of now: SUM-merge the per-batch
    sketch rows (O(batches × days × buckets) — never the stream),
    then the shared readout (corpusops.qsketch_quantiles)."""
    from .queries.corpusops import qsketch_quantiles

    rows = (
        spark.read.parquet(f"{output_dir}/qsk")
        .groupBy("day", "bucket")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    return qsketch_quantiles(rows, ["day"])


# --------------------------------------- streaming SLO-burn maintainer
def stream_slo_burn(spark: SparkSession, output_dir: str):
    """Exactly-once streaming error-budget maintenance: each
    micro-batch reduces to its ≤-days (day, total, err) rollup and
    writes it under its batch_id partition with dynamic overwrite —
    replace-only like the CMS/quantile maintainers (merge law is SUM,
    so a retried batch replaces itself via the checkpointed batch_id;
    a double-delivery under a NEW id would double-count). The current
    burn table is slo_burn_read_current: SUM-merge the partials and
    run the SAME readout the batch query runs
    (relational.slo_burn_from_daily) — never a rescan of the stream,
    and pinned equal to q_slo_burn on the same corpus in pytest.

    Returns the foreachBatch sink (expects ``ts`` and
    ``event_type``)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        g = batch_df.select(
            F.expr(
                "cast(unix_millis(cast(ts as timestamp)) div 86400000"
                " as bigint)"
            ).alias("day"),
            (F.col("event_type") == "error").cast("long").alias("iserr"),
        ).groupBy("day").agg(
            F.count(F.lit(1)).cast("long").alias("total"),
            F.sum("iserr").cast("long").alias("err"),
        )
        (
            g.withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
            .coalesce(1)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{output_dir}/slo")
        )

    return sink


def slo_burn_read_current(spark: SparkSession, output_dir: str) -> DataFrame:
    """The burn table as of now: SUM-merge the per-batch daily
    partials (O(batches × days) — never the stream), then the shared
    readout (relational.slo_burn_from_daily)."""
    from .queries.relational import slo_burn_from_daily

    g = (
        spark.read.parquet(f"{output_dir}/slo")
        .groupBy("day")
        .agg(
            F.sum("total").cast("long").alias("total"),
            F.sum("err").cast("long").alias("err"),
        )
    )
    return slo_burn_from_daily(g)


# ------------------------------------------- streaming activity bitmap
BITMAP_STATE_SCHEMA = "base_day long, mask long"
BITMAP_OUT_SCHEMA = (
    "user_id long, base_day long, mask long, n_active_64 int"
)


def stream_activity_bitmap(stream: DataFrame) -> DataFrame:
    """Streaming twin of q_activity_bitmap's per-user bitmap state
    (queries/relational.py): first-64-days activity packed into one
    bigint, maintained incrementally. bit_or is commutative,
    associative AND idempotent, so the maintainer is ORDER-INDEPENDENT
    across any delivery interleaving — with one subtlety: a LATE
    arrival carrying an EARLIER day than the current base re-bases the
    window (mask shifts left by the base delta; bits pushed past the
    64-day horizon drop — exactly what the batch query computes on the
    full data, where those days sit ≥64 after the true minimum).
    Python's unbounded ints do the shift exactly; the stored mask is
    the low 64 bits reinterpreted as a signed bigint (two's
    complement, the engine convention — day 63 is the sign bit).

    State per user is 16 bytes, the whole point of the bitmap: a
    10^9-user fleet holds its entire retention state in ~16 GB.

    Expected input columns: user_id (long), day (long)."""
    import pandas as pd  # noqa: F401 (worker-side import)

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            base, mask = state.get
            mask &= (1 << 64) - 1  # unsigned view for the shifts
        else:
            base, mask = None, 0
        for pdf in pdfs:
            for day in pdf["day"]:
                day = int(day)
                if base is None:
                    base = day
                elif day < base:
                    mask = (mask << (base - day)) & ((1 << 64) - 1)
                    base = day
                off = day - base
                if off < 64:
                    mask |= 1 << off
        signed = mask - (1 << 64) if mask >= (1 << 63) else mask
        state.update((base, signed))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "base_day": [base],
                "mask": [signed],
                "n_active_64": [bin(mask).count("1")],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=BITMAP_OUT_SCHEMA,
        stateStructType=BITMAP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
