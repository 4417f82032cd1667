"""Corpus-maintenance operators over ``documents``: trigram heavy
hitters, exact-k per-source sampling (two-phase hash-threshold form),
unicode text normalization, and a bloom-filter membership prefilter.

These are the corpus-hygiene half of a training-data pipeline: heavy
hitters feed boilerplate/contamination lists, exact-k sampling builds
balanced eval slices, normalization canonicalizes text before hashing
(the reference normalizes filenames and payload strings before keying,
/root/reference/mocov1/cls/pdpd/datapreprocess.py:20-44 — same
canonicalize-then-key discipline), and the bloom filter answers "did a
prior snapshot already contain this content?" without shuffling the
prior snapshot.

Scale notes per operator live on the functions; the shared discipline:
one corpus-wide aggregation each, map-side partial aggregation does the
heavy lifting, and anything collected to the driver is a fixed-size
sketch or a #sources-sized dimension — never data-proportional.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import load, spread

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, sql: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return reg


# --------------------------------------------------------- trigram top-k
_NGRAM_TOPK = 100


@_q(
    "q_ngram_topk",
    f"""
    WITH tok AS (
      SELECT list_filter(string_split(lower(text), ' '),
                         x -> x <> '') AS t
      FROM documents
    ),
    tri AS (
      SELECT t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS ngram
      FROM tok, LATERAL (
        SELECT unnest(generate_series(1, len(t) - 2)) AS i
      ) g
    )
    SELECT ngram, CAST(COUNT(*) AS bigint) AS cnt
    FROM tri GROUP BY ngram
    ORDER BY cnt DESC, ngram ASC LIMIT {_NGRAM_TOPK}
    """,
)
def q_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide trigram heavy hitters (top-{k} by count, ngram-asc
    tiebreak so the cut is deterministic). The n-gram list is the raw
    material for boilerplate detection and contamination screens.

    Scale: trigram generation is narrow (transform over the token
    array, no explode until the aggregation input); the single groupBy
    is hash-aggregated with map-side partials, so the shuffle carries
    one row per (partition, distinct-trigram) — repeated boilerplate
    collapses before the exchange. The top-k is TakeOrderedAndProject
    (per-partition heap, k rows to the driver), never a global sort.
    """
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    d = spread(load(spark, sf_dir, "documents")).select(toks.alias("t"))
    # sequence(1, n) descends when n < 1 — guard short docs to an empty
    # trigram list instead
    tri = F.when(
        F.size("t") >= 3,
        F.expr(
            "transform(sequence(1, size(t) - 2),"
            "          i -> concat_ws(' ', t[i-1], t[i], t[i+1]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        d.select(F.explode(tri).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("ngram"))
        .limit(_NGRAM_TOPK)
    )


# ------------------------------------------------- exact-k sample / source
_SAMPLE_K = 40


@_q(
    "q_exact_k_sample",
    f"""
    WITH h AS (
      SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh
      FROM documents
    ),
    r AS (
      SELECT source, doc_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY hh, doc_id) AS int)
               AS sample_rank
      FROM h
    )
    SELECT source, doc_id, sample_rank
    FROM r WHERE sample_rank <= {_SAMPLE_K}
    """,
)
def q_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-source deterministic sample: rank rows by
    md5(doc_id) within each source, keep the k smallest. The md5 order
    is a replayable uniform shuffle, so this is "uniform sample of
    exactly k docs per domain" — the balanced-eval-slice builder.

    Scale (the reason this is not just a window): a window over
    PARTITION BY source sorts the *entire corpus* inside a handful of
    hot source partitions — one reducer per domain at 100 TB. Instead,
    two-phase hash-threshold refinement: (1) per-source counts (one
    tiny aggregate) set a hash cutoff t ≈ (k + 6√k + 16)/n, so the
    candidate filter passes ~k+O(√k) rows per source map-side; (2) the
    exact window runs over only those candidates. A Chernoff bound
    makes an undershoot astronomically rare, but correctness never
    rests on it: a verification count re-windows any deficient source
    over its full rows, so the output is exactly the oracle's k.
    """
    k = _SAMPLE_K
    d = load(spark, sf_dir, "documents").select("source", "doc_id")
    d = d.withColumn("hh", F.md5(F.col("doc_id").cast("string")))
    # hex md5 compares lexicographically == numerically; the fraction
    # form of the first 8 nibbles drives the threshold prefilter
    frac = F.conv(F.substring("hh", 1, 8), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )
    slack = k + 6.0 * math.sqrt(k) + 16.0
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    thr = F.least(F.lit(1.0), F.lit(slack) / F.col("n_src"))
    dims = counts.select("source", thr.alias("thr"), "n_src")
    cand = d.join(F.broadcast(dims), "source").where(frac <= F.col("thr"))

    w = Window.partitionBy("source").orderBy("hh", "doc_id")
    ranked = cand.withColumn("sample_rank", F.row_number().over(w)).select(
        "source", "doc_id", "sample_rank"
    )

    # verification: every source must yield min(k, n) rows; a deficient
    # source (possible only if the Chernoff tail fired) is re-ranked
    # over its complete row set. The check touches only candidate rows.
    got = cand.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_cand"), F.first("n_src").alias("n_src")
    )
    deficient = [
        r.source
        for r in got.where(
            F.col("n_cand") < F.least(F.lit(k), F.col("n_src"))
        ).collect()
    ]
    if deficient:  # pragma: no cover — Chernoff tail; exists for proof
        full = (
            d.where(F.col("source").isin(deficient))
            .withColumn("sample_rank", F.row_number().over(w))
            .select("source", "doc_id", "sample_rank")
        )
        ranked = ranked.where(
            ~F.col("source").isin(deficient)
        ).unionByName(full)
    return ranked.where(F.col("sample_rank") <= k)


# ------------------------------------------------------- unicode normalize
# deterministic non-ASCII decoration so the gate actually exercises NFC
# composition cross-engine (the driver corpus is pure ASCII): doc_id%3
# picks a decomposed-form prefix; both engines build the identical
# decorated string, then normalize.
_DECOR = ["café ", "éclair ", "Å "]  # é, é, Å decomposed


@_q(
    "q_text_normalize",
    f"""
    WITH decorated AS (
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS int)
               WHEN 0 THEN '{_DECOR[0]}' WHEN 1 THEN '{_DECOR[1]}'
               ELSE '{_DECOR[2]}' END || text || '  \t trailing' AS raw
      FROM documents
    )
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(nfc_normalize(raw),
                            '[\\x00-\\x1F\\x7F]', '', 'g'),
             ' +', ' ', 'g')) AS norm_text
    FROM decorated
    """,
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization: NFC-compose, strip control characters,
    collapse space runs, trim — the pass that runs before any
    content-hash dedup so that byte-distinct, canonically-equal texts
    key together (é as U+0065 U+0301 vs U+00E9).

    Spark has no built-in NFC, so this is the honest vectorized-UDF
    path: an Arrow-batched pandas UDF using pandas' .str.normalize —
    narrow, no shuffle, scales with input splits. The control-strip and
    space-collapse stay in the same batch pass (one string traversal
    family per batch rather than three Catalyst regex nodes on top of a
    UDF boundary crossing).
    """
    @F.pandas_udf("string")
    def nfc_clean(s):
        return (
            s.str.normalize("NFC")
            .str.replace("[\x00-\x1f\x7f]", "", regex=True)
            .str.replace(" +", " ", regex=True)
            .str.strip()
        )

    d = spread(load(spark, sf_dir, "documents")).select("doc_id", "text")
    decor = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(_DECOR[0]))
        .when(F.col("doc_id") % 3 == 1, F.lit(_DECOR[1]))
        .otherwise(F.lit(_DECOR[2]))
    )
    raw = F.concat(decor, F.col("text"), F.lit("  \t trailing"))
    return d.select("doc_id", nfc_clean(raw).alias("norm_text"))


# ---------------------------------------------------- bloom membership
_BLOOM_BITS = 1 << 18  # 262144 bits = 4096 longs = 32 KiB sketch
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_SEEDS = 4


def _bloom_positions(col, seed: int):
    """Bit position for (value, seed): xxhash64 over a seed-prefixed
    value, folded into the table. pmod keeps it non-negative."""
    return F.pmod(
        F.xxhash64(F.concat(F.lit(f"s{seed}:"), col)), F.lit(_BLOOM_BITS)
    )


def bloom_build(corpus: DataFrame, col: str) -> list:
    """Build the bloom sketch over ``corpus[col]``: each value sets
    _BLOOM_SEEDS bits; per-word OR-aggregation happens distributed
    (groupBy word → bit_or, map-side partials collapse duplicate words
    long before the exchange carries at most _BLOOM_WORDS rows per map
    task); only the finished 4096-long sketch is collected. At larger
    m (a 100-TB corpus wants ~2^33 bits) the same plan holds — the
    collect is m/64 longs regardless of corpus size, and the broadcast
    to probers is the standard torrent broadcast.
    """
    pos = corpus.select(
        F.explode(
            F.array(
                *[
                    _bloom_positions(F.col(col), s)
                    for s in range(_BLOOM_SEEDS)
                ]
            )
        ).alias("pos")
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("int").alias("word"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    arr = [0] * _BLOOM_WORDS
    for r in words:
        arr[r.word] = r.bits
    return arr


def bloom_probe(batch: DataFrame, col: str, sketch: list) -> DataFrame:
    """Add ``maybe_dup``: True iff all _BLOOM_SEEDS bits for
    ``batch[col]`` are set in the sketch. No false negatives by
    construction; false positives bounded by (set-bit density)^k. The
    sketch rides in as a one-row broadcast dimension, so the probe is a
    narrow map over the batch — the prior snapshot itself never moves.
    """
    spark = batch.sparkSession
    sk = spark.createDataFrame([(sketch,)], "bloom array<bigint>")
    hit = None
    for s in range(_BLOOM_SEEDS):
        pos = _bloom_positions(F.col(col), s)
        word = F.element_at("bloom", (pos / 64).cast("int") + 1)
        bit = F.expr(
            f"shiftleft(1L, cast(pmod(xxhash64('s{s}:' || {col}),"
            f" {_BLOOM_BITS}) % 64 as int))"
        )
        term = (word.bitwiseAND(bit)) != 0
        hit = term if hit is None else (hit & term)
    return batch.crossJoin(F.broadcast(sk)).withColumn(
        "maybe_dup", hit
    ).drop("bloom")


@_q("x_bloom_dedup")  # xxhash64 sketch — not DuckDB-expressible; the
#                       no-false-negative property is pytest-gated
def x_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-snapshot membership screen: build a bloom sketch
    over the current corpus' normalized content hashes, then probe an
    incoming batch (here: half replayed docs, half genuinely-new
    perturbations) for "content the corpus may already contain". The
    cheap prefilter in front of the exact anti-join — only
    maybe_dup=True rows need the authoritative lookup, so the exact
    join's probe side shrinks by the true-new fraction (most of a
    fresh crawl).
    """
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    ch = F.md5(F.lower(F.regexp_replace("text", r"[ \t\n\x0B\f\r]+", " ")))
    corpus = d.select(ch.alias("h"))
    sketch = bloom_build(corpus, "h")

    replay = d.where(F.col("doc_id") % 2 == 0).select(
        "doc_id", "text", F.lit(False).alias("is_new")
    )
    fresh = d.where(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" entirely new suffix")).alias("text"),
        F.lit(True).alias("is_new"),
    )
    batch = replay.unionByName(fresh).withColumn("h", ch)
    return bloom_probe(batch, "h", sketch).select(
        "doc_id", "is_new", "maybe_dup"
    )
