"""Incremental (rolling-ingest) dedup against persisted signature state.

Round-5 addition: every dedup query in the registry is one-shot over
the full corpus, but a rolling 100-TB ingest dedups NEW shards against
the accumulated corpus without rescanning it. This module persists the
accepted corpus ONLY as its signature tables — the normalized-content
exact hash and the MinHash LSH band buckets, O(survivors) rows with
none of the original text — so the increment for batch N+1 computes
signatures for ITS OWN rows exactly once and anti-joins them against
the persisted state. Batch ≤N text is never rescanned; batch ≤N
signatures are never recomputed (tests/test_incdedup.py pins the
state files byte-stable across later increments).

Reference anchor: the insert-if-absent probe + per-run seen-set of
/root/reference/ocrclient/redisdata.py:106-108,170 — the per-key Redis
``setnx``-style probe generalized to corpus scale: the "seen set"
becomes two parquet signature tables and the N probe round-trips
become two anti-joins per batch.

Policy — identical, by construction, to the oracled one-shot fold
``q_incdedup_fold`` (queries/dedup.py), which unrolls the same rules
over a fixed batch list in both Spark and DuckDB:

  * exact rule: a doc is dropped iff its normalized-content hash
    (util.content_hash_col) equals an ACCEPTED doc's hash from an
    earlier committed batch, or a smaller-doc_id doc in its OWN batch
    shares the hash.
  * near rule (applied to exact survivors): a doc is dropped iff it
    shares a MinHash band bucket (band, bh) with an ACCEPTED doc from
    an earlier batch, or with a smaller-doc_id exact-survivor of its
    own batch — whether or not that blocker itself survives (the
    PAIRWISE rule: order-free given doc_id order, SQL-expressible,
    and exactly what a signature-state probe can answer; exact
    duplicates carry identical band sets, so restricting in-batch
    blockers to exact survivors loses nothing).
  * the accepted state grows by the batch's survivors only — a doc is
    never retroactively un-accepted (rolling-ingest semantics).

State layout (plain parquet; on a real cluster each table maps to an
Iceberg table and the ledger append to a snapshot commit — the same
emulation boundary as lineage.py):

  state_dir/exact/batch-<id>/       (doc_id, h)        survivors only
  state_dir/signatures/batch-<id>/  (doc_id, band, bh) survivors only
  state_dir/survivors/batch-<id>/   (doc_id)
  state_dir/ledger/                 one row per committed batch

A batch is committed iff its ledger row exists; the ledger row is
appended LAST, so a crash anywhere earlier leaves per-batch staging
directories that are invisible to readers (state readers enumerate
committed batch ids from the ledger, never glob the data dirs) and
are idempotently overwritten when the batch is retried.

Scale notes: per increment the only corpus-sized work is the new
batch's own shingle scan (one groupBy(doc_id) with map-side partial
mins, see dedup._mh_sig_df). The anti-joins are equi-joins on a
32-char hash / (band int, 32-char bh) — they shuffle signatures,
never text. Accumulated state grows O(total survivors × bands); at
10^12 turns you would bucket the signature tables by bh (Iceberg
``bucket(N, bh)``) so the per-batch probe join is partition-pruned
to the buckets the new batch actually touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .lineage import _path_exists
from .queries.util import content_hash_col

LEDGER_SCHEMA = (
    "batch_seq int, batch_id string, n_in bigint, n_exact_dropped bigint, "
    "n_near_dropped bigint, n_survivors bigint"
)
_EXACT_SCHEMA = "doc_id bigint, h string"
_SIG_SCHEMA = "doc_id bigint, band int, bh string"
_SURV_SCHEMA = "doc_id bigint"


def _ledger_rows(spark: SparkSession, state_dir: str) -> list:
    path = f"{state_dir}/ledger"
    if not _path_exists(spark, path):
        return []
    return (
        spark.read.schema(LEDGER_SCHEMA)
        .parquet(path)
        .orderBy("batch_seq")
        .collect()
    )


def committed_batches(spark: SparkSession, state_dir: str) -> list[str]:
    """Committed batch ids in commit (batch_seq) order."""
    return [r["batch_id"] for r in _ledger_rows(spark, state_dir)]


def _read_state(
    spark: SparkSession, state_dir: str, sub: str, schema: str, ids: list[str]
) -> DataFrame:
    """Union of one state table over the COMMITTED batches only — an
    uncommitted (crashed) batch's staging directory is never read."""
    paths = [f"{state_dir}/{sub}/batch-{b}" for b in ids]
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def accepted_state(
    spark: SparkSession, state_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(exact hashes, band signatures) of every accepted doc so far."""
    ids = committed_batches(spark, state_dir)
    return (
        _read_state(spark, state_dir, "exact", _EXACT_SCHEMA, ids),
        _read_state(spark, state_dir, "signatures", _SIG_SCHEMA, ids),
    )


def read_survivors(spark: SparkSession, state_dir: str) -> DataFrame:
    """(batch_seq, doc_id) of every accepted doc, committed batches only."""
    rows = _ledger_rows(spark, state_dir)
    if not rows:
        return spark.createDataFrame([], "batch_seq int, doc_id bigint")
    out = None
    for r in rows:
        part = _read_state(
            spark, state_dir, "survivors", _SURV_SCHEMA, [r["batch_id"]]
        ).select(F.lit(r["batch_seq"]).cast("int").alias("batch_seq"), "doc_id")
        out = part if out is None else out.unionByName(part)
    return out


def exact_survivors(dd: DataFrame, acc_exact: DataFrame) -> DataFrame:
    """Exact rule over (doc_id, h): keep min doc_id per hash within
    the batch, then drop hashes the accepted state already holds."""
    wmin = Window.partitionBy("h")
    return (
        dd.withColumn("mind", F.min("doc_id").over(wmin))
        .where(F.col("doc_id") == F.col("mind"))
        .drop("mind")
        .join(acc_exact.select("h"), "h", "left_anti")
    )


def near_filter(
    ek: DataFrame, bands: DataFrame, acc_bands: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Near rule over the exact survivors ``ek`` (doc_id, h) and
    THEIR band rows ``bands`` (doc_id, band, bh — any superset is
    filtered to ek here): drop docs sharing a bucket with the
    accepted state or with a smaller-doc_id exact survivor. Returns
    (survivor (doc_id, h), survivor bands). This pair of helpers is
    the single policy implementation shared by the state-backed
    increment and the one-shot fold — the two can only differ in
    where the accepted state comes from."""
    bands = bands.join(ek.select("doc_id"), "doc_id")
    dropped_state = (
        bands.join(acc_bands.select("band", "bh"), ["band", "bh"], "left_semi")
        .select("doc_id")
        .distinct()
    )
    blockers = bands.select("band", "bh", F.col("doc_id").alias("doc_b"))
    dropped_in = (
        bands.join(blockers, ["band", "bh"])
        .where(F.col("doc_b") < F.col("doc_id"))
        .select("doc_id")
        .distinct()
    )
    dropped = dropped_state.unionByName(dropped_in).distinct()
    sk = ek.join(dropped, "doc_id", "left_anti")
    return sk, bands.join(sk.select("doc_id"), "doc_id")


def batch_survivors(
    docs: DataFrame, acc_exact: DataFrame, acc_bands: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """One increment's policy from raw (doc_id, text): the exact rule
    first, then MinHash bands computed for the EXACT SURVIVORS ONLY —
    at web scale 30–50 % of a batch can be exact twins, and their
    shingle md5 work is pure waste (a twin's bands are identical to
    its keeper's, so the blocker set is unchanged — see the policy
    note in the module docstring)."""
    from .queries.dedup import _mh_band_df

    dd = docs.select("doc_id", content_hash_col().alias("h"))
    ek = exact_survivors(dd, acc_exact)
    ek_docs = docs.join(ek.select("doc_id"), "doc_id")
    return near_filter(ek, _mh_band_df(ek_docs), acc_bands)


def dedup_increment(
    spark: SparkSession,
    docs: DataFrame,
    state_dir: str,
    batch_id: str,
    _crash_before_commit: bool = False,
) -> dict:
    """One rolling increment: dedup ``docs`` (the NEW batch only —
    doc_id, text) against the committed state, persist the survivors'
    signatures, commit the batch. Idempotent: a batch_id that is
    already committed is a no-op returning its ledger stats, so a
    retried driver never double-appends. ``_crash_before_commit``
    simulates dying after the data writes but before the ledger append
    (the staging dirs are left behind, like a real crash)."""
    led = _ledger_rows(spark, state_dir)
    for r in led:
        if r["batch_id"] == batch_id:
            return {k: r[k] for k in r.asDict()}
    seq = (max((r["batch_seq"] for r in led), default=-1)) + 1
    ids = [r["batch_id"] for r in led]
    acc_exact = _read_state(spark, state_dir, "exact", _EXACT_SCHEMA, ids)
    acc_bands = _read_state(spark, state_dir, "signatures", _SIG_SCHEMA, ids)

    n_in = docs.count()
    sk, sk_bands = batch_survivors(docs, acc_exact, acc_bands)
    n_exact_kept = (
        docs.select("doc_id", content_hash_col().alias("h"))
        .withColumn("mind", F.min("doc_id").over(Window.partitionBy("h")))
        .where(F.col("doc_id") == F.col("mind"))
        .join(acc_exact.select("h"), "h", "left_anti")
        .count()
    )

    sk.write.mode("overwrite").parquet(f"{state_dir}/exact/batch-{batch_id}")
    sk_bands.write.mode("overwrite").parquet(
        f"{state_dir}/signatures/batch-{batch_id}"
    )
    sk.select("doc_id").write.mode("overwrite").parquet(
        f"{state_dir}/survivors/batch-{batch_id}"
    )
    if _crash_before_commit:
        return {"batch_seq": seq, "batch_id": batch_id, "committed": False}

    # counts from the files just written (write verification, the
    # lineage.py idiom): the commit records what is durably on disk
    n_surv = (
        spark.read.schema(_SURV_SCHEMA)
        .parquet(f"{state_dir}/survivors/batch-{batch_id}")
        .count()
    )
    stats = {
        "batch_seq": seq,
        "batch_id": batch_id,
        "n_in": n_in,
        "n_exact_dropped": n_in - n_exact_kept,
        "n_near_dropped": n_exact_kept - n_surv,
        "n_survivors": n_surv,
    }
    spark.createDataFrame(
        [tuple(stats[f] for f in (
            "batch_seq", "batch_id", "n_in", "n_exact_dropped",
            "n_near_dropped", "n_survivors",
        ))],
        LEDGER_SCHEMA,
    ).write.mode("append").parquet(f"{state_dir}/ledger")
    return stats


def rolling_fold(
    docs: DataFrame, n_batches: int, seq_col=None
) -> DataFrame:
    """One-shot reference fold: the SAME policy applied to a batched
    corpus entirely in memory (no filesystem state) — batch k of
    ``n_batches`` is ``doc_id % n_batches == k`` unless ``seq_col``
    (an int Column) is given. Returns (batch_seq, doc_id) survivors.
    The batch loop is driver-side over the BATCH COUNT (a bounded
    ingest-schedule constant, never data-sized); all per-batch work is
    the shared batch_survivors() DataFrame core."""
    from .queries.dedup import _mh_band_df

    spark = docs.sparkSession
    seq = (
        seq_col
        if seq_col is not None
        else (F.col("doc_id") % n_batches).cast("int")
    )
    batched = docs.withColumn("seq", seq)
    # the fold replays every batch in ONE session, so signatures are
    # computed for the whole corpus in ONE shingle scan up front
    # (localCheckpoint-ed: each batch round reuses the materialized
    # rows instead of re-scanning text n_batches times) — the
    # state-backed path gets the same economy from its parquet state
    dd_all = batched.select(
        "seq", "doc_id", content_hash_col().alias("h")
    ).localCheckpoint()
    bands_all = (
        _mh_band_df(batched)
        .join(dd_all.select("doc_id", "seq"), "doc_id")
        .localCheckpoint()
    )
    acc_exact = spark.createDataFrame([], _EXACT_SCHEMA)
    acc_bands = spark.createDataFrame([], _SIG_SCHEMA)
    out = None
    for k in range(n_batches):
        # localCheckpoint truncates lineage per round (the components
        # idiom, dedup.py:892): without it batch k's plan embeds and
        # RE-EXECUTES every earlier batch's plan — exponential in the
        # batch count instead of linear
        ek = exact_survivors(
            dd_all.where(F.col("seq") == k).drop("seq"), acc_exact
        )
        sk, sk_bands = near_filter(
            ek, bands_all.where(F.col("seq") == k).drop("seq"), acc_bands
        )
        sk = sk.localCheckpoint()
        sk_bands = sk_bands.localCheckpoint()
        part = sk.select(
            F.lit(k).cast("int").alias("batch_seq"), "doc_id"
        )
        out = part if out is None else out.unionByName(part)
        acc_exact = acc_exact.unionByName(sk.select("doc_id", "h"))
        acc_bands = acc_bands.unionByName(sk_bands)
    return out


# ---------------------------------------------- simhash rolling layer
# A SECOND rolling policy over the same commit machinery, with a
# stronger semantics than the minhash layer: VERIFY-AFTER-PROBE. The
# minhash policy drops on any shared band bucket (a probabilistic
# Jaccard screen — fast, but a bucket collision IS the decision); the
# simhash policy's decision is the EXACT hamming rule
#   drop d  ⟺  ∃ accepted/earlier doc a with
#               hamming(fp_d, fp_a) ≤ SIMHASH_ROLL_HAMMING
# and the pigeonhole band probe (simsearch.simhash_band_segments,
# n_bands = hamming_max + 1) is only the COMPLETE candidate generator
# — every qualifying pair shares a segment, the exact bit_count(xor)
# check after the join rejects false-positive bucket collisions. The
# DuckDB oracle of q_incdedup_simhash_fold therefore needs NO banding
# at all (plain NOT EXISTS over the hamming predicate): the gate
# machine-checks probe-then-verify == the exact rule, per batch.
# State per accepted doc: 16 bytes (doc_id, fp) — the fingerprint IS
# the index (band keys are bit slices, recomputed in the probe).

from .queries.dedup import _SIMHASH_HAMMING_MAX as SIMHASH_ROLL_HAMMING  # noqa: E402 (= 8; one source of truth with the pair anchors)

_FP_SCHEMA = "doc_id bigint, simhash bigint"


def simhash_near_filter(
    ek: DataFrame, fps: DataFrame, acc_fp: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Verify-after-probe near rule: drop exact-survivor d when an
    accepted doc, or a smaller-doc_id exact survivor of its own
    batch, sits within SIMHASH_ROLL_HAMMING of d's fingerprint.
    ``fps`` = (doc_id, simhash) covering at least ek's docs. Returns
    (survivor (doc_id, h), survivor (doc_id, simhash))."""
    from .queries.simsearch import simhash_band_segments

    fps = fps.join(ek.select("doc_id"), "doc_id")
    segs = simhash_band_segments(fps, SIMHASH_ROLL_HAMMING)
    ham = F.expr("bit_count(a.simhash ^ b.simhash)")
    seg_join = lambda a, b: (  # noqa: E731
        (F.col("a.seg") == F.col("b.seg"))
        & (F.col("a.seg_val") == F.col("b.seg_val"))
    )
    a = segs.alias("a")
    acc_segs = simhash_band_segments(acc_fp, SIMHASH_ROLL_HAMMING)
    dropped_state = (
        a.join(acc_segs.alias("b"), seg_join("a", "b"))
        .where(ham <= SIMHASH_ROLL_HAMMING)
        .select(F.col("a.doc_id").alias("doc_id"))
        .distinct()
    )
    dropped_in = (
        a.join(
            segs.alias("b"),
            seg_join("a", "b") & (F.col("b.doc_id") < F.col("a.doc_id")),
        )
        .where(ham <= SIMHASH_ROLL_HAMMING)
        .select(F.col("a.doc_id").alias("doc_id"))
        .distinct()
    )
    dropped = dropped_state.unionByName(dropped_in).distinct()
    sk = ek.join(dropped, "doc_id", "left_anti")
    return sk, fps.join(sk.select("doc_id"), "doc_id")


def simhash_increment(
    spark: SparkSession,
    docs: DataFrame,
    state_dir: str,
    batch_id: str,
    _crash_before_commit: bool = False,
) -> dict:
    """One rolling increment under the simhash policy — same ledger
    machinery and commit discipline as dedup_increment (ledger row
    LAST; staging invisible until committed; idempotent on replay),
    with fingerprint state under ``fps/batch-<id>``."""
    from .queries.dedup import _simhash_df

    led = _ledger_rows(spark, state_dir)
    for r in led:
        if r["batch_id"] == batch_id:
            return {k: r[k] for k in r.asDict()}
    seq = (max((r["batch_seq"] for r in led), default=-1)) + 1
    ids = [r["batch_id"] for r in led]
    acc_exact = _read_state(spark, state_dir, "exact", _EXACT_SCHEMA, ids)
    acc_fp = _read_state(spark, state_dir, "fps", _FP_SCHEMA, ids)

    n_in = docs.count()
    dd = docs.select("doc_id", content_hash_col().alias("h"))
    ek = exact_survivors(dd, acc_exact)
    ek_docs = docs.join(ek.select("doc_id"), "doc_id")
    sk, sk_fp = simhash_near_filter(ek, _simhash_df(ek_docs), acc_fp)
    n_exact_kept = ek.count()

    sk.write.mode("overwrite").parquet(f"{state_dir}/exact/batch-{batch_id}")
    sk_fp.write.mode("overwrite").parquet(f"{state_dir}/fps/batch-{batch_id}")
    sk.select("doc_id").write.mode("overwrite").parquet(
        f"{state_dir}/survivors/batch-{batch_id}"
    )
    if _crash_before_commit:
        return {"batch_seq": seq, "batch_id": batch_id, "committed": False}

    n_surv = (
        spark.read.schema(_SURV_SCHEMA)
        .parquet(f"{state_dir}/survivors/batch-{batch_id}")
        .count()
    )
    stats = {
        "batch_seq": seq,
        "batch_id": batch_id,
        "n_in": n_in,
        "n_exact_dropped": n_in - n_exact_kept,
        "n_near_dropped": n_exact_kept - n_surv,
        "n_survivors": n_surv,
    }
    spark.createDataFrame(
        [tuple(stats[f] for f in (
            "batch_seq", "batch_id", "n_in", "n_exact_dropped",
            "n_near_dropped", "n_survivors",
        ))],
        LEDGER_SCHEMA,
    ).write.mode("append").parquet(f"{state_dir}/ledger")
    return stats


def simhash_rolling_fold(
    docs: DataFrame, n_batches: int, seq_col=None
) -> DataFrame:
    """One-shot reference fold of the simhash rolling policy (the
    rolling_fold twin — see its docstring for the loop/localCheckpoint
    rationale). Returns (batch_seq, doc_id) survivors."""
    from .queries.dedup import _simhash_df

    spark = docs.sparkSession
    seq = (
        seq_col
        if seq_col is not None
        else (F.col("doc_id") % n_batches).cast("int")
    )
    batched = docs.withColumn("seq", seq)
    dd_all = batched.select(
        "seq", "doc_id", content_hash_col().alias("h")
    ).localCheckpoint()
    fp_all = (
        _simhash_df(batched)
        .join(dd_all.select("doc_id", "seq"), "doc_id")
        .localCheckpoint()
    )
    acc_exact = spark.createDataFrame([], _EXACT_SCHEMA)
    acc_fp = spark.createDataFrame([], _FP_SCHEMA)
    out = None
    for k in range(n_batches):
        ek = exact_survivors(
            dd_all.where(F.col("seq") == k).drop("seq"), acc_exact
        )
        sk, sk_fp = simhash_near_filter(
            ek, fp_all.where(F.col("seq") == k).drop("seq"), acc_fp
        )
        sk = sk.localCheckpoint()
        sk_fp = sk_fp.localCheckpoint()
        part = sk.select(F.lit(k).cast("int").alias("batch_seq"), "doc_id")
        out = part if out is None else out.unionByName(part)
        acc_exact = acc_exact.unionByName(sk.select("doc_id", "h"))
        acc_fp = acc_fp.unionByName(sk_fp)
    return out
