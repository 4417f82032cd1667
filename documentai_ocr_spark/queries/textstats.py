"""Text-analysis ops over ``documents``: language ID (stopword n-gram
heuristic), quality scoring, token counting, winnowing fingerprints.

All scores are ratios of exact integer counts (both engines perform one
identical double division) — no accumulation-order hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .util import content_hash_col, content_hash_sql, load, ntok_col, ntok_sql, spread

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, sql: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return reg


# ------------------------------------------------------------------ lang id
_STOPWORDS = [
    ("the", "en"), ("a", "en"), ("and", "en"), ("of", "en"), ("to", "en"),
    ("is", "en"), ("in", "en"),
    ("el", "es"), ("la", "es"), ("de", "es"), ("que", "es"), ("y", "es"),
    ("los", "es"),
    ("der", "de"), ("die", "de"), ("und", "de"), ("das", "de"), ("ist", "de"),
    ("mit", "de"),
    ("le", "fr"), ("les", "fr"), ("et", "fr"), ("des", "fr"), ("un", "fr"),
    ("du", "fr"),
]
_SW_VALUES = ",".join(f"('{w}','{lang}')" for w, lang in _STOPWORDS)


@_q(
    "q_lang_id",
    f"""
    WITH sw AS (SELECT * FROM (VALUES {_SW_VALUES}) t(w, lang)),
    tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
            FROM documents),
    sc AS (SELECT doc_id, lang, CAST(COUNT(*) AS bigint) AS cnt
           FROM tok JOIN sw USING (w) GROUP BY doc_id, lang),
    best AS (SELECT doc_id, lang, cnt,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY cnt DESC, lang ASC) AS rn
             FROM sc)
    SELECT d.doc_id, coalesce(b.lang, 'unk') AS pred_lang,
           CAST(coalesce(b.cnt, 0) AS bigint) AS best_cnt
    FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID: tokens ⋈ broadcast stopword rule table
    → per-(doc, lang) counts → argmax (ties broken by lang, docs with no
    hits → 'unk'). The rule table broadcast is the reference's
    small-lookup-dict pattern (/root/reference/ocrclient/render2image.py:15-35)."""
    return _langid_pred(spark, sf_dir)


def _langid_pred(spark: SparkSession, sf_dir: str, cols=("doc_id",)):
    """The ONE engine rendering of the stopword-vote predictor: tokens ⋈
    broadcast stopword rule table → per-(doc, lang) counts → argmax
    (ties broken by lang, no hits → 'unk'). ``cols`` threads extra
    document columns through (e.g. the declared lang for evaluation).
    Returns (*cols, pred_lang, best_cnt)."""
    docs = spread(
        load(spark, sf_dir, "documents").select(*cols, "text")
    )
    sw = spark.createDataFrame(_STOPWORDS, "w string, lang string")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    sc = (
        tok.join(F.broadcast(sw), "w")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("lang"))
    best = (
        sc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id", F.col("lang").alias("_rule_lang"), "cnt"
        )  # renamed: a caller may thread the DECLARED lang through cols
    )
    return (
        docs.select(*cols)
        .join(best, "doc_id", "left")
        .select(
            *cols,
            F.coalesce("_rule_lang", F.lit("unk")).alias("pred_lang"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("best_cnt"),
        )
    )


# ------------------------------------------------------------------ quality
_EN_STOP_RE = r"\b(the|a|and|of|to|is|in)\b"


@_q(
    "q_quality_score",
    f"""
    SELECT doc_id,
           CAST(length(text) AS bigint) AS n_chars_m,
           CAST(len(string_split(text, ' ')) AS bigint) AS n_tokens,
           ROUND(CAST(length(text)
                  - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS double)
                 / length(text), 6) AS alpha_ratio,
           ROUND(CAST(length(text)
                  - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS double)
                 / length(text), 6) AS punct_ratio,
           ROUND(CAST(len(regexp_extract_all(lower(text), '{_EN_STOP_RE}')) AS double)
                 / len(string_split(text, ' ')), 6) AS stopword_ratio
    FROM documents WHERE length(text) > 0
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: length, token count, alpha ratio,
    punctuation ratio, stopword ratio (the C4/Gopher-style rule family;
    generalizes the reference's length/score filters,
    /root/reference/ocrclient/redisdata.py:226, render_han.py:12-13)."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    n = F.length("text")
    n_alpha = n - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
    n_punct = n - F.length(F.regexp_replace("text", "[^A-Za-z0-9 ]", ""))
    n_tok = F.size(F.split(F.col("text"), " "))
    n_stop = F.size(F.regexp_extract_all(F.lower("text"), F.lit(_EN_STOP_RE), 0))
    return docs.where(n > 0).select(
        "doc_id",
        n.cast("long").alias("n_chars_m"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(n_alpha.cast("double") / n, 6).alias("alpha_ratio"),
        F.round(n_punct.cast("double") / n, 6).alias("punct_ratio"),
        F.round(n_stop.cast("double") / n_tok, 6).alias("stopword_ratio"),
    )


# -------------------------------------------------------------- token count
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@_q(
    "q_token_count",
    f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS bigint) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS bigint) AS bpe_tokens
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    lexer (letters / digits / single punctuation)."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), 0))
        .cast("long")
        .alias("bpe_tokens"),
    )


# -------------------------------------------------------------- fingerprint
_WINNOW_K = 4   # k-gram size
_WINNOW_W = 4   # winnowing window (rows)


@_q(
    "q_winnow_fingerprint",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    kg AS (SELECT doc_id, i,
                  ('0x' || substr(md5(tk[i] || ' ' || tk[i+1] || ' ' ||
                                      tk[i+2] || ' ' || tk[i+3]), 1, 15))::bigint AS h
           FROM toks, unnest(generate_series(1, len(tk) - 3)) g(i)),
    wm AS (SELECT doc_id,
                  MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS mh
           FROM kg)
    SELECT doc_id, CAST(COUNT(DISTINCT mh) AS bigint) AS n_fp,
           CAST(MIN(mh) AS bigint) AS min_fp, CAST(MAX(mh) AS bigint) AS max_fp
    FROM wm GROUP BY doc_id
    """,
)
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by winnowing (Schleimer et al.): word
    4-gram rolling hashes → per-window minimum → distinct selected
    fingerprints. The sliding min is DOC-bounded, so the whole
    computation stays in-row: one transform builds the gram-hash array,
    a second takes each window's array_min over a slice (tail windows
    clamp, matching ROWS ... FOLLOWING), and the three outputs read the
    mins array — ZERO shuffle, no explode, no window sort (the previous
    form exploded every gram string and sorted a per-doc window: the
    same answer at ~10× the cost)."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    gram_h = lambda i: (  # noqa: E731
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ",
                        *[F.element_at(toks, i + j) for j in range(_WINNOW_K)],
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
    )
    hs = F.transform(F.sequence(F.lit(1), n - (_WINNOW_K - 1)), gram_h)
    with_hs = docs.where(n >= _WINNOW_K).select("doc_id", hs.alias("hs"))
    L = F.size(F.col("hs"))
    mins = F.transform(
        F.sequence(F.lit(1), L),
        lambda j: F.array_min(
            F.slice(F.col("hs"), j, F.least(F.lit(_WINNOW_W), L - j + 1))
        ),
    )
    wm = with_hs.select("doc_id", mins.alias("mins"))
    return wm.select(
        "doc_id",
        F.size(F.array_distinct("mins")).cast("long").alias("n_fp"),
        F.array_min("mins").cast("long").alias("min_fp"),
        F.array_max("mins").cast("long").alias("max_fp"),
    )


# -------------------------------------------------------------- model hook
@_q(
    "q_model_classify",
    """
    WITH t AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
    f AS (
      SELECT doc_id,
             length(text) AS n,
             least(length(text), 1000) / 1000.0 AS f1,
             CASE WHEN length(text) > 0 THEN
               CAST(length(regexp_replace(text, '[^0-9A-Za-z一-龥]', '', 'g'))
                    AS double) / length(text) ELSE 0.0 END AS f2,
             CASE WHEN length(text) > 0 THEN
               CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                    AS double) / length(text) ELSE 0.0 END AS f3,
             CASE WHEN length(text) > 0 THEN
               CAST(length(regexp_replace(text, '[^ ]', '', 'g'))
                    AS double) / length(text) ELSE 0.0 END AS f4
      FROM t
    )
    SELECT doc_id,
           0.1 + 0.3 * f1 + 0.5 * f2 + -0.2 * f3 + 0.1 * f4 AS score,
           CAST(CASE WHEN 0.1 + 0.3 * f1 + 0.5 * f2 + -0.2 * f3 + 0.1 * f4
                          >= 0.5
                     THEN 1 ELSE 0 END AS int) AS label
    FROM f
    """,
)
def q_model_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batched model-inference hook end-to-end (inference.py):
    broadcast weights → per-worker model singleton → 256-row DataLoader
    micro-batches inside each Arrow batch. The bundled model is a
    deterministic linear scorer, so DuckDB reproduces the exact doubles —
    the gate checks the WHOLE hook path (batching, broadcast, schema),
    not just the arithmetic."""
    from ..inference import batch_classify

    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    return batch_classify(docs, id_col="doc_id", text_col="text")


# ------------------------------------------------------------ curation gate
@_q(
    "q_curation_gate",
    f"""
    WITH f AS (
      SELECT doc_id,
             length(text) AS n,
             len(string_split(text, ' ')) AS n_tok,
             CASE WHEN length(text) > 0 THEN
               CAST(length(regexp_replace(text, '[^0-9A-Za-z一-龥]', '', 'g'))
                    AS double) / length(text) ELSE 0.0 END AS dens,
             {content_hash_sql()} AS h
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             row_number() OVER (PARTITION BY h ORDER BY doc_id) = 1
               AS canonical
      FROM f
    )
    SELECT f.doc_id,
           f.n >= 100 AS len_ok,
           f.dens >= 0.6 AS dens_ok,
           f.n_tok BETWEEN 20 AND 2000 AS tok_ok,
           c.canonical,
           f.n >= 100 AND f.dens >= 0.6 AND f.n_tok BETWEEN 20 AND 2000
             AND c.canonical AS keep
    FROM f JOIN canon c ON f.doc_id = c.doc_id
    """,
)
def q_curation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-curation decision a training-data pipeline
    runs per document: length floor, informative-density floor, token
    band, and exact-dedup canonicality (first doc_id per normalized
    content hash survives — the reference's dedupe-before-insert rule,
    /root/reference/ocrclient/rechanimage.py:52-53, applied corpus-wide).
    One scan computes the features; canonicality is one window over the
    16-byte hash — at 100 TB the only shuffle is hash-keyed and narrow."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    n = F.length("text")
    n_tok = F.size(F.split("text", " "))
    dens = F.when(
        n > 0,
        F.length(F.regexp_replace("text", "[^0-9A-Za-z一-龥]", "")).cast(
            "double"
        )
        / n,
    ).otherwise(F.lit(0.0))
    h = content_hash_col()
    f = docs.select(
        "doc_id",
        n.alias("n"),
        n_tok.alias("n_tok"),
        dens.alias("dens"),
        h.alias("h"),
    )
    w = Window.partitionBy("h").orderBy("doc_id")
    c = f.withColumn("canonical", F.row_number().over(w) == 1)
    len_ok = F.col("n") >= 100
    dens_ok = F.col("dens") >= 0.6
    tok_ok = (F.col("n_tok") >= 20) & (F.col("n_tok") <= 2000)
    return c.select(
        "doc_id",
        len_ok.alias("len_ok"),
        dens_ok.alias("dens_ok"),
        tok_ok.alias("tok_ok"),
        "canonical",
        (len_ok & dens_ok & tok_ok & F.col("canonical")).alias("keep"),
    )


# ------------------------------------------------------------- repetition
@_q(
    "q_repetition",
    """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    t AS (SELECT doc_id, CAST(len(tk) AS bigint) AS n_tok,
                 CAST(len(list_distinct(tk)) AS bigint) AS n_distinct
          FROM tok),
    g AS (SELECT doc_id,
                 CAST(COUNT(*) AS bigint) AS n_g3,
                 CAST(COUNT(DISTINCT s) AS bigint) AS n_g3_distinct
          FROM (SELECT doc_id,
                       tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
                FROM tok, unnest(generate_series(1, len(tk) - 2)) u(i))
          GROUP BY doc_id)
    SELECT t.doc_id, t.n_tok, t.n_distinct,
           ROUND(1.0 - CAST(t.n_distinct AS double) / t.n_tok, 6)
             AS dup_tok_ratio,
           CAST(coalesce(g.n_g3, 0) AS bigint) AS n_g3,
           ROUND(CASE WHEN g.n_g3 > 0
                      THEN 1.0 - CAST(g.n_g3_distinct AS double) / g.n_g3
                      ELSE 0.0 END, 6) AS dup_g3_ratio
    FROM t LEFT JOIN g ON t.doc_id = g.doc_id
    WHERE t.n_tok > 0
    """,
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (the Gopher repetition rules): dup
    token fraction and dup word-3-gram fraction — high values mark the
    degenerate/boilerplate docs a training pipeline drops. Exact integer
    distinct counts on both engines; one groupBy per granularity."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    tk = F.split("text", " ")
    t = docs.select(
        "doc_id",
        F.size(tk).cast("long").alias("n_tok"),
        F.size(F.array_distinct(tk)).cast("long").alias("n_distinct"),
    )
    sh = (
        docs.select(
            "doc_id",
            F.explode(
                F.when(
                    F.size(tk) >= 3, F.sequence(F.lit(1), F.size(tk) - 2)
                ).otherwise(F.array().cast("array<int>"))
            ).alias("i"),
            tk.alias("tk"),
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at("tk", F.col("i")),
                F.element_at("tk", F.col("i") + 1),
                F.element_at("tk", F.col("i") + 2),
            ).alias("s"),
        )
    )
    g = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_g3"),
        F.countDistinct("s").cast("long").alias("n_g3_distinct"),
    )
    return (
        t.where(F.col("n_tok") > 0)
        .join(g, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            "n_distinct",
            F.round(
                1.0 - F.col("n_distinct").cast("double") / F.col("n_tok"), 6
            ).alias("dup_tok_ratio"),
            F.coalesce("n_g3", F.lit(0)).cast("long").alias("n_g3"),
            F.round(
                F.when(
                    F.col("n_g3") > 0,
                    1.0
                    - F.col("n_g3_distinct").cast("double") / F.col("n_g3"),
                ).otherwise(0.0),
                6,
            ).alias("dup_g3_ratio"),
        )
    )


# -------------------------------------------------------------- PII scrub
# conservative char-class-only patterns (identical semantics in Java
# regex and RE2 — no \s, no unicode classes, no backrefs)
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
_PII_PHONE = "[0-9][0-9][0-9][-. ][0-9][0-9][0-9][-. ][0-9][0-9][0-9][0-9]"


@_q(
    "q_pii_scrub",
    f"""
    WITH seeded AS (
      SELECT doc_id,
             text || CASE doc_id % 4
               WHEN 0 THEN ' contact bob' || CAST(doc_id AS varchar)
                           || '@example.com now'
               WHEN 1 THEN ' call 555-123-4567 or 555 987 6543 today'
               WHEN 2 THEN ' mail a.b+c@sub.domain.org please'
               ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS bigint)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS bigint)
             AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>',
                                             'g'),
                              '{_PII_PHONE}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM seeded
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + scrubbing (emails, phone-shaped numbers): count
    and redact with engine-portable char-class patterns — the privacy
    pass a training pipeline runs before packing text. PII strings are
    seeded deterministically per doc_id so the fixture corpus actually
    exercises the scrubber; the scrubbed text is hashed so the gate
    value-compares full redaction results without shipping megabytes."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    m = F.col("doc_id") % 4
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                m == 0,
                F.concat(
                    F.lit(" contact bob"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            )
            .when(m == 1, F.lit(" call 555-123-4567 or 555 987 6543 today"))
            .when(m == 2, F.lit(" mail a.b+c@sub.domain.org please"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"),
        _PII_PHONE,
        "<PHONE>",
    )
    return seeded.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_PII_EMAIL), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PII_PHONE), 0))
        .cast("long")
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


# -------------------------------------------------------- sequence packing
# Training-side document packing (GPT-style concat-and-chop): documents
# are concatenated in a stable order and chopped into fixed-size token
# blocks; the pipeline needs each document's global token offset and the
# block span it lands in (to mask cross-document attention / count
# boundary-straddling docs). Packing is PER SOURCE shard — partition by
# source keeps the cumulative sum distributed (one window shuffle, no
# global single-partition scan; a corpus-global pack would use the same
# two-phase partial-sum composition as q_group_range).
_PACK_BLOCK = 512  # tokens per training block
_PACK_BUCKETS = 32


@_q(
    "q_token_packing",
    f"""
    WITH t AS (SELECT doc_id, source,
                      CAST(len(string_split(text, ' ')) AS bigint) AS n
               FROM documents),
    c AS (SELECT doc_id, source, n,
                 COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS tok_beg
          FROM t)
    SELECT doc_id, source, n AS n_toks, tok_beg,
           CAST(tok_beg // {_PACK_BLOCK} AS bigint) AS blk_beg,
           CAST((tok_beg + n - 1) // {_PACK_BLOCK} AS bigint) AS blk_end,
           tok_beg // {_PACK_BLOCK} <> (tok_beg + n - 1) // {_PACK_BLOCK}
             AS spans_boundary
    FROM c
    """,
)
def q_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop packing layout per source shard: every document's
    global token offset within its source's (doc_id-ordered) stream;
    block indices are pure arithmetic on it.

    Scale — the cumulative sum WITHOUT a whole-source window: a corpus
    has O(10) sources, so `SUM OVER (PARTITION BY source ORDER BY
    doc_id)` sorts an entire source in one task. Two-phase instead
    (same pattern as q_epoch_shuffle): (1) bucket rows by equal-width
    doc_id ranges — a monotone function of the order key, so bucket
    order is a prefix of full (source, doc_id) order; (2) a tiny
    aggregate yields per-(source, bucket) token totals (O(sources ×
    _PACK_BUCKETS) rows) whose per-source exclusive prefix-sum — a
    window over the TINY dim, ≤ _PACK_BUCKETS rows per source — is
    each bucket's starting offset, broadcast back; (3) the running sum
    runs per (source, bucket), ~1/_PACK_BUCKETS of a source per task,
    plus the bucket offset. At 1000 executors raise _PACK_BUCKETS to
    O(cores); the dim stays tiny."""
    docs = spread(
        load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    t = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n"),
    )
    lo, hi = t.agg(F.min("doc_id"), F.max("doc_id")).first()
    lo, hi = (lo or 0), (hi or 0)
    width = max(1, (hi - lo + _PACK_BUCKETS) // _PACK_BUCKETS)
    # exact integer floor (`div`), never float `/` + cast: above 2^53
    # adjacent long ids collapse to one double and bucket edges round
    t = t.withColumn(
        "pack_bucket",
        F.expr(f"cast((doc_id - {lo}L) div {width}L as int)"),
    )
    bdim = t.groupBy("source", "pack_bucket").agg(F.sum("n").alias("bsum"))
    woff = (
        Window.partitionBy("source")
        .orderBy("pack_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bdim = bdim.select(
        "source",
        "pack_bucket",
        F.coalesce(F.sum("bsum").over(woff), F.lit(0)).alias("boff"),
    )
    w = (
        Window.partitionBy("source", "pack_bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.join(F.broadcast(bdim), ["source", "pack_bucket"]).withColumn(
        "tok_beg",
        F.col("boff") + F.coalesce(F.sum("n").over(w), F.lit(0)),
    )
    blk_beg = F.floor(F.col("tok_beg") / _PACK_BLOCK).cast("long")
    blk_end = F.floor(
        (F.col("tok_beg") + F.col("n") - 1) / _PACK_BLOCK
    ).cast("long")
    return c.select(
        "doc_id",
        "source",
        F.col("n").alias("n_toks"),
        "tok_beg",
        blk_beg.alias("blk_beg"),
        blk_end.alias("blk_end"),
        (blk_beg != blk_end).alias("spans_boundary"),
    )


# ------------------------------------------------------ stratified sampling
# Deterministic per-source subsampling: every curation pipeline downweights
# over-represented sources. The rate table is a tiny per-source dim
# (broadcast — the classic small-dim join); membership is an md5 coin on
# doc_id, so any worker anywhere reproduces the exact same sample with no
# RNG state (rerunnable, resumable, auditable).
@_q(
    "q_stratified_sample",
    """
    WITH rates AS (
      SELECT source,
             25 + ('0x' || substr(md5(source), 1, 8))::bigint % 50 AS rate_pct
      FROM (SELECT DISTINCT source FROM documents)
    )
    SELECT d.doc_id, d.source, r.rate_pct
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS varchar)), 1, 8))::bigint
            % 100 < r.rate_pct
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source deterministic sampling: broadcast the per-source rate
    dim, keep a document iff md5(doc_id) mod 100 falls under its
    source's rate — a pure filter after a broadcast join, so the scan
    never shuffles."""
    docs = spread(
        load(spark, sf_dir, "documents").select("doc_id", "source")
    )
    md5i = lambda c: F.conv(  # noqa: E731
        F.substring(F.md5(c), 1, 8), 16, 10
    ).cast("long")
    rates = (
        docs.select("source")
        .distinct()
        .select(
            "source", (25 + md5i(F.col("source")) % 50).alias("rate_pct")
        )
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .where(md5i(F.col("doc_id").cast("string")) % 100 < F.col("rate_pct"))
        .select("doc_id", "source", "rate_pct")
    )


# ------------------------------------------------- unigram LM quality score
# The CCNet-family perplexity proxy: score each document by the mean
# log-probability of its tokens under the CORPUS unigram distribution —
# gibberish and boilerplate-heavy documents sit in the tails. Two
# aggregations: the unigram table (vocab-sized — broadcast; at web scale
# a sampled/top-K vocab with an UNK bucket, same shape) and one
# per-document sum. Rounded after the final division per the
# cross-engine accumulation discipline.
#
# ONE rendering per engine of the scored-document frame (doc_id, source,
# n_toks, avg_logprob) — consumed by q_unigram_logprob (the raw score
# report) AND q_ppl_buckets (the CCNet head/middle/tail assignment), so
# the bucket boundaries can never disagree with the published scores.
_ULP_CTES = """
    tok AS (SELECT doc_id, source,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents),
    uni AS (SELECT tok, CAST(COUNT(*) AS bigint) AS cnt FROM tok GROUP BY tok),
    tot AS (SELECT CAST(SUM(cnt) AS bigint) AS total FROM uni),
    ulp AS (
      SELECT t.doc_id, ANY_VALUE(t.source) AS source,
             CAST(COUNT(*) AS bigint) AS n_toks,
             ROUND(SUM(ln(CAST(u.cnt AS double) / tot.total)) / COUNT(*), 6)
               AS avg_logprob
      FROM tok t JOIN uni u ON t.tok = u.tok, tot
      GROUP BY t.doc_id
    )"""


def _ulp_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the _ULP_CTES `ulp` frame: (doc_id, source, n_toks,
    avg_logprob). Corpus unigram counts broadcast back onto the token
    stream; one per-doc aggregation — the probability join never
    shuffles the corpus."""
    docs = spread(
        load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    tok = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("tok")
    )
    uni = tok.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    total = uni.agg(F.sum("cnt").cast("long").alias("total"))
    return (
        tok.join(F.broadcast(uni), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.any_value(F.col("source")).alias("source"),
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.round(
                F.sum(
                    F.log(F.col("cnt").cast("double") / F.col("total"))
                )
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
    )


@_q(
    "q_unigram_logprob",
    f"""
    WITH {_ULP_CTES}
    SELECT doc_id, n_toks, avg_logprob FROM ulp
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document — the raw-score view of
    the shared _ULP_CTES / _ulp_df rendering (see q_ppl_buckets for the
    tercile assignment built on the same frame)."""
    return _ulp_df(spark, sf_dir).select("doc_id", "n_toks", "avg_logprob")


# ------------------------------------------------- CCNet ppl terciles
# CCNet's signature curation step (Wenzek et al., 2020 §4.3): order each
# source's documents by LM score and cut the source into head / middle /
# tail thirds — head = the most-fluent third (highest mean logprob =
# lowest perplexity), tail = the least. Pretraining recipes then sample
# the thirds at different rates. The boundary rule is EXACT integer
# arithmetic on the cume_dist rational (3·le ≤ n, 3·le ≤ 2·n) so a
# boundary document can never straddle engines on a float comparison.
_PPL_BUCKETS = 32


@_q(
    "q_ppl_buckets",
    f"""
    WITH {_ULP_CTES},
    r AS (SELECT doc_id, source,
                 CAST(ROUND(avg_logprob * 1000000) AS bigint) AS score_micro
          FROM ulp),
    c AS (SELECT doc_id, source, score_micro,
                 CAST(COUNT(*) OVER (
                   PARTITION BY source ORDER BY score_micro
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS bigint) AS le,
                 CAST(COUNT(*) OVER (PARTITION BY source) AS bigint) AS n
          FROM r)
    SELECT doc_id, source, score_micro,
           CASE WHEN 3 * le <= n THEN 'tail'
                WHEN 3 * le <= 2 * n THEN 'middle'
                ELSE 'head' END AS ppl_bucket
    FROM c
    """,
)
def q_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail assignment per source from the shared
    unigram-LM score (score_micro = the published avg_logprob × 10⁶ as
    an exact integer — derived FROM the rounded score, so the bucket can
    never disagree with q_unigram_logprob's report). A doc is 'tail' if
    its within-source ≤-rank satisfies 3·le ≤ n, 'middle' if 3·le ≤ 2·n,
    else 'head' — ties share a ≤-count, hence a bucket, and cume_dist's
    upper-step convention falls out of the integer rule for free.

    Scale — terciles WITHOUT a whole-source sort: the same two-phase
    value-bucket decomposition as q_score_calibration (le = rows in
    earlier value buckets, a broadcast ≤O(sources×32) dim, + a
    RANGE-framed count within this row's bucket, ~1/_PPL_BUCKETS of a
    source per task). The doc-grain score frame comes from _ulp_df's
    broadcast-unigram join — the corpus token stream is aggregated
    before any window."""
    r = _ulp_df(spark, sf_dir).select(
        "doc_id",
        "source",
        F.round(F.col("avg_logprob") * 1000000)
        .cast("long")
        .alias("score_micro"),
    )
    lo, hi = r.agg(F.min("score_micro"), F.max("score_micro")).first()
    lo, hi = (lo or 0), (hi or 0)
    width = max(1, (hi - lo + _PPL_BUCKETS) // _PPL_BUCKETS)
    r = r.withColumn(
        "vbucket",
        F.expr(f"cast((score_micro - {lo}L) div {width}L as int)"),
    )
    cdim = r.groupBy("source", "vbucket").agg(
        F.count(F.lit(1)).alias("bcnt")
    )
    woff = (
        Window.partitionBy("source")
        .orderBy("vbucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy("source")
    cdim = cdim.select(
        "source",
        "vbucket",
        F.coalesce(F.sum("bcnt").over(woff), F.lit(0)).alias("coff"),
        F.sum("bcnt").over(wtot).alias("n"),
    )
    wle = (
        Window.partitionBy("source", "vbucket")
        .orderBy("score_micro")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = r.join(F.broadcast(cdim), ["source", "vbucket"]).withColumn(
        "le", F.col("coff") + F.count(F.lit(1)).over(wle)
    )
    return j.select(
        "doc_id",
        "source",
        "score_micro",
        F.when(3 * F.col("le") <= F.col("n"), F.lit("tail"))
        .when(3 * F.col("le") <= 2 * F.col("n"), F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("ppl_bucket"),
    )


# ------------------------------------------- top n-gram coverage
# The OTHER half of Gopher's repetition table (Rae et al., 2021 A1):
# q_repetition measures duplicate-n-gram FRACTIONS; this measures the
# fraction of the document covered by its single most frequent bigram
# and trigram — the signature of generation loops and templated spam
# that duplicate fractions alone under-weight (one dominant phrase vs
# many scattered repeats).
@_q(
    "q_top_ngram_coverage",
    """
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '),
                         x -> x <> '') AS t
      FROM documents
    ),
    pos AS (
      SELECT doc_id, i, t[i] AS w, len(t) AS n
      FROM tok, LATERAL (
        SELECT unnest(generate_series(1, len(t))) AS i
      ) g
    ),
    bg AS (
      SELECT doc_id, n,
             w || ' ' || lead(w) OVER (
               PARTITION BY doc_id ORDER BY i) AS g2,
             w || ' ' || lead(w) OVER (
               PARTITION BY doc_id ORDER BY i) || ' ' ||
               lead(w, 2) OVER (PARTITION BY doc_id ORDER BY i) AS g3
      FROM pos
    ),
    bgc AS (
      SELECT doc_id, MAX(n) AS n, MAX(c) AS max_bg
      FROM (SELECT doc_id, g2, MAX(n) AS n, COUNT(*) AS c
            FROM bg WHERE g2 IS NOT NULL GROUP BY doc_id, g2)
      GROUP BY doc_id
    ),
    tgc AS (
      SELECT doc_id, MAX(c) AS max_tg
      FROM (SELECT doc_id, g3, COUNT(*) AS c
            FROM bg WHERE g3 IS NOT NULL GROUP BY doc_id, g3)
      GROUP BY doc_id
    )
    SELECT tok.doc_id,
           CAST(len(tok.t) AS BIGINT) AS n_tokens,
           ROUND(COALESCE(bgc.max_bg * 2.0 / bgc.n, 0.0), 6)
             AS top_bigram_frac,
           ROUND(COALESCE(tgc.max_tg * 3.0 / bgc.n, 0.0), 6)
             AS top_trigram_frac
    FROM tok
    LEFT JOIN bgc USING (doc_id)
    LEFT JOIN tgc USING (doc_id)
    """,
)
def q_top_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-n-gram coverage: occurrences of the most
    frequent bigram × 2 / n_tokens, and of the most frequent trigram
    × 3 / n_tokens. Both gram streams come off ONE explode of the
    token array built in-row (slice arithmetic, no window pass on the
    Spark side); the only shuffles are (doc_id, gram)-keyed
    partial-aggregating groupBys, so skew is bounded by one document's
    length and the corpus text itself never moves."""
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", toks.alias("t")
    )
    base = d.select("doc_id", F.size("t").alias("n_tokens"), "t")
    grams = base.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(1, size(t) - 1), i -> struct("
                    " concat_ws(' ', slice(t, i, 2)) as g2,"
                    " CASE WHEN i <= size(t) - 2"
                    "  THEN concat_ws(' ', slice(t, i, 3)) END as g3))"
                ),
            ).otherwise(
                F.array().cast("array<struct<g2:string,g3:string>>")
            )
        ).alias("x"),
    ).select("doc_id", "n_tokens", "x.g2", "x.g3")
    bgc = (
        grams.groupBy("doc_id", "g2")
        .agg(F.max("n_tokens").alias("n"), F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("n"), F.max("c").alias("max_bg"))
    )
    tgc = (
        grams.where(F.col("g3").isNotNull())
        .groupBy("doc_id", "g3")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_tg"))
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(bgc, "doc_id", "left")
        .join(tgc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.coalesce(
                    F.col("max_bg") * 2.0 / F.col("n"), F.lit(0.0)
                ),
                6,
            ).alias("top_bigram_frac"),
            F.round(
                F.coalesce(
                    F.col("max_tg") * 3.0 / F.col("n"), F.lit(0.0)
                ),
                6,
            ).alias("top_trigram_frac"),
        )
    )


# ----------------------------------------- interpolated bigram LM score
# The KenLM-proxy quality signal one tier above q_unigram_logprob: mean
# log-probability under a Laplace-smoothed bigram model interpolated
# with the unigram model (lambda=0.7) — low scores mark incoherent or
# out-of-distribution text. All corpus statistics reduce map-side; the
# bigram-count dim is vocab²-bounded and joins the bigram stream on its
# own key (NOT broadcast — at web scale that dim is large; Catalyst/AQE
# may still pick broadcast when it fits, which is the right call).
_BILM_LAMBDA = 0.7


@_q(
    "q_bigram_logprob",
    f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '),
                         x -> x <> '') AS t
      FROM documents
    ),
    occ AS (
      SELECT doc_id, i, t[i] AS w
      FROM tok, LATERAL (
        SELECT unnest(generate_series(1, len(t))) AS i
      ) g
    ),
    uni AS (SELECT w, CAST(COUNT(*) AS bigint) AS c1 FROM occ GROUP BY w),
    scal AS (SELECT CAST(SUM(c1) AS bigint) AS tot,
                    CAST(COUNT(*) AS bigint) AS v FROM uni),
    bg AS (
      SELECT doc_id, w AS w1,
             lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
      FROM occ
    ),
    bgp AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
    bgc AS (SELECT w1, w2, CAST(COUNT(*) AS bigint) AS c12
            FROM bgp GROUP BY w1, w2)
    SELECT bgp.doc_id,
           CAST(COUNT(*) AS bigint) AS n_bigrams,
           ROUND(SUM(ln(
             {_BILM_LAMBDA} * (bgc.c12 + 1.0) / (u1.c1 + scal.v)
             + {1.0 - _BILM_LAMBDA} * (u2.c1 + 1.0) / (scal.tot + scal.v)
           )) / COUNT(*), 6) AS avg_logprob
    FROM bgp
    JOIN bgc USING (w1, w2)
    JOIN uni u1 ON bgp.w1 = u1.w
    JOIN uni u2 ON bgp.w2 = u2.w, scal
    GROUP BY bgp.doc_id
    """,
)
def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean interpolated bigram log-probability per document:
    p(w2|w1) = λ·(c12+1)/(c1+V) + (1−λ)·(c2+1)/(T+V), λ={_BILM_LAMBDA}.

    Scale: unigram dim (vocab) and the two scalars broadcast; the
    bigram stream joins the bigram-count dim on (w1, w2) — a keyed,
    partially-aggregated equi-join whose width is vocab², never the
    corpus; the final per-doc mean is the only doc-keyed shuffle."""
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", toks.alias("t")
    )
    occ = d.select("doc_id", F.explode("t").alias("w"))
    uni = occ.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    scal = uni.agg(
        F.sum("c1").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    bgp = d.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(1, size(t) - 1), i -> struct("
                    " element_at(t, i) as w1,"
                    " element_at(t, i + 1) as w2))"
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("x"),
    ).select("doc_id", "x.w1", "x.w2")
    bgc = bgp.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    lam = _BILM_LAMBDA
    u1 = uni.withColumnRenamed("w", "w1").withColumnRenamed("c1", "c1a")
    u2 = uni.withColumnRenamed("w", "w2").withColumnRenamed("c1", "c1b")
    return (
        bgp.join(bgc, ["w1", "w2"])
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(scal))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.sum(
                    F.log(
                        lam
                        * (F.col("c12") + 1.0)
                        / (F.col("c1a") + F.col("v"))
                        + (1.0 - lam)
                        * (F.col("c1b") + 1.0)
                        / (F.col("tot") + F.col("v"))
                    )
                )
                / F.count(F.lit(1)),
                6,
            ).alias("avg_logprob"),
        )
    )


# --------------------------------------------------- PMI collocations
# Corpus-wide word-association mining (collocation extraction, the
# word2vec/phrase-mining prep): pointwise mutual information over
# adjacent token pairs, keeping pairs seen >= _PMI_MIN times. Distinct
# from q_bigram_logprob (which scores DOCUMENTS under an LM): PMI
# scores WORD PAIRS against independence, ranking the corpus's fused
# phrases.
_PMI_MIN = 5
_PMI_TOPK = 50


@_q(
    "q_pmi_collocations",
    f"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '),
                         x -> x <> '') AS t
      FROM documents
    ),
    occ AS (
      SELECT doc_id, i, t[i] AS w
      FROM tok, LATERAL (
        SELECT unnest(generate_series(1, len(t))) AS i
      ) g
    ),
    uni AS (SELECT w, CAST(COUNT(*) AS bigint) AS c FROM occ GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS bigint) AS t FROM uni),
    bg AS (
      SELECT w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
      FROM occ
    ),
    bgc AS (
      SELECT w1, w2, CAST(COUNT(*) AS bigint) AS c12
      FROM bg WHERE w2 IS NOT NULL
      GROUP BY w1, w2 HAVING COUNT(*) >= {_PMI_MIN}
    ),
    scored AS (
      SELECT bgc.w1, bgc.w2, bgc.c12,
             ROUND(ln(CAST(bgc.c12 AS double) * tot.t
                      / (u1.c * u2.c)), 6) AS pmi
      FROM bgc
      JOIN uni u1 ON bgc.w1 = u1.w
      JOIN uni u2 ON bgc.w2 = u2.w, tot
    )
    SELECT w1, w2, c12, pmi
    FROM scored
    ORDER BY pmi DESC, w1, w2
    LIMIT {_PMI_TOPK}
    """,
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_PMI_TOPK} adjacent-pair collocations by PMI =
    ln(c12·T / (c1·c2)), min pair count {_PMI_MIN}.

    Scale: unigram dim + the total broadcast; the pair count dim is
    HAVING-pruned before scoring (rare pairs never leave the partial
    agg); final top-K is a TakeOrderedAndProject on the ROUNDED score
    with a lexicographic tiebreak so rank is identical across
    engines."""
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    d = spread(load(spark, sf_dir, "documents")).select(
        "doc_id", toks.alias("t")
    )
    occ = d.select("doc_id", F.explode("t").alias("w"))
    uni = occ.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = uni.agg(F.sum("c").cast("long").alias("t"))
    bgp = d.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(1, size(t) - 1), i -> struct("
                    " element_at(t, i) as w1,"
                    " element_at(t, i + 1) as w2))"
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("x"),
    ).select("x.w1", "x.w2")
    bgc = (
        bgp.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
        .where(F.col("c12") >= _PMI_MIN)
    )
    u1 = uni.selectExpr("w AS w1", "c AS c1")
    u2 = uni.selectExpr("w AS w2", "c AS c2")
    scored = (
        bgc.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c12",
            F.round(
                F.log(
                    F.col("c12").cast("double")
                    * F.col("t")
                    / (F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), "w1", "w2"
    ).limit(_PMI_TOPK)


# --------------------------------------------------- score calibration
# Rank-normalization before cross-source mixing: raw quality scores
# (here the length proxy) are not comparable across sources with
# different distributions; cume_dist within source maps every doc onto
# [0,1] by its within-source rank — the calibration step before a
# global quality threshold is applied to a multi-source corpus.
_CALIB_BUCKETS = 32


@_q(
    "q_score_calibration",
    """
    SELECT doc_id, source,
           CAST(n_chars AS bigint) AS n_chars,
           ROUND(cume_dist() OVER (
             PARTITION BY source ORDER BY n_chars), 6) AS pct_rank
    FROM documents
    """,
)
def q_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-source cumulative-distribution rank of n_chars (ties share
    the upper step value — cume_dist is deterministic under ties, unlike
    percent_rank ordering games).

    Scale — cume_dist WITHOUT a whole-source window: `cume_dist() OVER
    (PARTITION BY source ORDER BY n_chars)` sorts an entire source in
    one task, and a corpus has O(10) sources. Decompose: cume_dist(x) =
    (# rows in the source with value ≤ x) / (source total). Bucket rows
    by equal-width VALUE ranges of n_chars — ties share a value, hence
    a bucket, so the ≤-count never crosses a bucket boundary except
    through whole earlier buckets. Then (1) a tiny per-(source, bucket)
    count dim gives each bucket's exclusive prefix (rows in earlier
    buckets, all ≤ by construction) and the source totals; (2) within a
    bucket a RANGE-framed count window (frame end = current row ⇒ all
    peers/ties included) counts rows ≤ x locally, ~1/_CALIB_BUCKETS of
    a source per task. Identical output to the single-window form —
    oracle-gated against DuckDB's cume_dist."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    lo, hi = d.agg(F.min("n_chars"), F.max("n_chars")).first()
    lo, hi = (lo or 0), (hi or 0)
    width = max(1, (hi - lo + _CALIB_BUCKETS) // _CALIB_BUCKETS)
    # exact integer floor (`div`) — same discipline as q_token_packing
    d = d.withColumn(
        "vbucket",
        F.expr(f"cast((n_chars - {lo}L) div {width}L as int)"),
    )
    cdim = d.groupBy("source", "vbucket").agg(
        F.count(F.lit(1)).alias("bcnt")
    )
    woff = (
        Window.partitionBy("source")
        .orderBy("vbucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy("source")
    cdim = cdim.select(
        "source",
        "vbucket",
        F.coalesce(F.sum("bcnt").over(woff), F.lit(0)).alias("coff"),
        F.sum("bcnt").over(wtot).alias("ctotal"),
    )
    wle = (
        Window.partitionBy("source", "vbucket")
        .orderBy("n_chars")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(F.broadcast(cdim), ["source", "vbucket"])
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.round(
                (F.col("coff") + F.count(F.lit(1)).over(wle)).cast("double")
                / F.col("ctotal").cast("double"),
                6,
            ).alias("pct_rank"),
        )
    )


# --------------------------------------------------- classifier evaluation
# Per-class precision / recall / F1 of the stopword-vote language ID
# against the corpus's declared labels — the model-evaluation rollup a
# curation pipeline runs after swapping any classifier. The confusion
# table is an O(classes²) dim; every metric is exact integer counts
# with ONE rounded division (F1 uses the 2·tp/(support+predicted)
# identity so no rounded intermediate feeds another division). The
# fixture confuses for real: zh has no stopword rows, so zh documents
# land on latin classes or 'unk'.

# ONE SQL rendering of the stopword-vote predictor (the Spark twin is
# _langid_pred) — interpolated by the confusion dim below AND by
# q_tokenizer_fertility, so every consumer of a predicted language
# evaluates the SAME classifier.
_PRED_SQL = f"""sw AS (SELECT * FROM (VALUES {_SW_VALUES}) t(w, lang)),
    tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
            FROM documents),
    sc AS (SELECT doc_id, lang, CAST(COUNT(*) AS bigint) AS cnt
           FROM tok JOIN sw USING (w) GROUP BY doc_id, lang),
    best AS (SELECT doc_id, lang, cnt,
                    row_number() OVER (PARTITION BY doc_id
                      ORDER BY cnt DESC, lang ASC) AS rn
             FROM sc),
    pred AS (
      SELECT d.doc_id, d.lang, coalesce(b.lang, 'unk') AS pred_lang
      FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
    )"""

# the predictor rolled into the classes² confusion dim — interpolated
# by q_langid_eval AND q_langid_kappa so the classifier under
# evaluation can never drift between the scorecard and the agreement
# statistic.
_PRED_CONF_SQL = f"""{_PRED_SQL},
    conf AS (SELECT lang, pred_lang, COUNT(*) AS n
             FROM pred GROUP BY lang, pred_lang)"""


@_q(
    "q_langid_eval",
    f"""
    WITH {_PRED_CONF_SQL},
    decl AS (SELECT lang AS cls, SUM(n) AS support,
                    COALESCE(SUM(n) FILTER (pred_lang = lang), 0) AS tp
             FROM conf GROUP BY lang),
    prd AS (SELECT pred_lang AS cls, SUM(n) AS predicted
            FROM conf GROUP BY pred_lang)
    SELECT COALESCE(d.cls, p.cls) AS cls,
           CAST(COALESCE(d.support, 0) AS bigint) AS support,
           CAST(COALESCE(p.predicted, 0) AS bigint) AS predicted,
           CAST(COALESCE(d.tp, 0) AS bigint) AS tp,
           ROUND(CAST(COALESCE(d.tp, 0) AS double)
                 / NULLIF(p.predicted, 0), 6) AS precision,
           ROUND(CAST(COALESCE(d.tp, 0) AS double)
                 / NULLIF(d.support, 0), 6) AS recall,
           ROUND(2.0 * COALESCE(d.tp, 0)
                 / NULLIF(COALESCE(d.support, 0)
                          + COALESCE(p.predicted, 0), 0), 6) AS f1
    FROM decl d FULL OUTER JOIN prd p ON d.cls = p.cls
    """,
)
def q_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier scorecard per class: support, predicted, tp,
    precision, recall, F1. Runs the SAME predictor as q_lang_id
    (_langid_pred with the declared label threaded through), rolls the
    per-doc pairs into the classes² confusion dim, then two tiny
    rollups full-outer-join on the class key — classes present only in
    predictions ('unk') get NULL recall, classes never predicted get
    NULL precision."""
    pred = _langid_pred(spark, sf_dir, cols=("doc_id", "lang"))
    conf = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    decl = conf.groupBy(F.col("lang").alias("cls")).agg(
        F.sum("n").alias("support"),
        F.coalesce(
            F.sum(F.when(F.col("pred_lang") == F.col("lang"), F.col("n"))),
            F.lit(0),
        ).alias("tp"),
    )
    prd = conf.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.sum("n").alias("predicted")
    )
    j = decl.join(prd, "cls", "full_outer")
    support = F.coalesce("support", F.lit(0))
    predicted = F.coalesce("predicted", F.lit(0))
    tp = F.coalesce("tp", F.lit(0))
    return j.select(
        "cls",
        support.cast("long").alias("support"),
        predicted.cast("long").alias("predicted"),
        tp.cast("long").alias("tp"),
        F.round(
            tp.cast("double") / F.nullif(F.col("predicted"), F.lit(0)), 6
        ).alias("precision"),
        F.round(
            tp.cast("double") / F.nullif(F.col("support"), F.lit(0)), 6
        ).alias("recall"),
        F.round(
            F.lit(2.0) * tp / F.nullif(support + predicted, F.lit(0)), 6
        ).alias("f1"),
    )


# --------------------------------------------------- chance-corrected kappa
@_q(
    "q_langid_kappa",
    f"""
    WITH {_PRED_CONF_SQL},
    decl AS (SELECT lang AS cls, SUM(n) AS support,
                    COALESCE(SUM(n) FILTER (pred_lang = lang), 0) AS tp
             FROM conf GROUP BY lang),
    prd AS (SELECT pred_lang AS cls, SUM(n) AS predicted
            FROM conf GROUP BY pred_lang),
    cls AS (SELECT COALESCE(d.support, 0) AS support,
                   COALESCE(d.tp, 0) AS tp,
                   COALESCE(p.predicted, 0) AS predicted
            FROM decl d FULL OUTER JOIN prd p ON d.cls = p.cls),
    tot AS (SELECT SUM(support) AS n, SUM(tp) AS agree,
                   SUM(support * predicted) AS sp
            FROM cls)
    SELECT CAST(n AS bigint) AS n_docs,
           CAST(agree AS bigint) AS n_agree,
           ROUND(CAST(agree AS double) / n, 6) AS po,
           ROUND(CAST(sp AS double) / (n * n), 6) AS pe,
           ROUND(CAST(agree * n - sp AS double)
                 / NULLIF(n * n - sp, 0), 6) AS kappa
    FROM tot
    """,
)
def q_langid_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa of the language-ID rule against the declared
    labels — the chance-corrected agreement a curation pipeline reads
    before trusting a classifier on an imbalanced corpus (raw accuracy
    rewards always-guessing the majority class; kappa doesn't). Runs
    the SAME predictor/confusion dim as q_langid_eval (_PRED_CONF_SQL /
    _langid_pred — one rendering per engine). Float discipline: po, pe
    and kappa are each ONE rounded division of exact bigint sums —
    kappa uses the integer identity (agree·n − Σsᵢpᵢ)/(n² − Σsᵢpᵢ) so
    no rounded intermediate feeds another division. Shape: the classes²
    confusion dim rolls to a classes-row dim, then one 1-row aggregate
    — nothing beyond O(classes) rows ever leaves the partial aggs."""
    pred = _langid_pred(spark, sf_dir, cols=("doc_id", "lang"))
    conf = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    decl = conf.groupBy(F.col("lang").alias("cls")).agg(
        F.sum("n").alias("support"),
        F.coalesce(
            F.sum(F.when(F.col("pred_lang") == F.col("lang"), F.col("n"))),
            F.lit(0),
        ).alias("tp"),
    )
    prd = conf.groupBy(F.col("pred_lang").alias("cls")).agg(
        F.sum("n").alias("predicted")
    )
    cls = decl.join(prd, "cls", "full_outer").select(
        F.coalesce("support", F.lit(0)).alias("support"),
        F.coalesce("tp", F.lit(0)).alias("tp"),
        F.coalesce("predicted", F.lit(0)).alias("predicted"),
    )
    tot = cls.agg(
        F.sum("support").alias("n"),
        F.sum("tp").alias("agree"),
        F.sum(F.col("support") * F.col("predicted")).alias("sp"),
    )
    n, agree, sp = F.col("n"), F.col("agree"), F.col("sp")
    return tot.select(
        n.cast("long").alias("n_docs"),
        agree.cast("long").alias("n_agree"),
        F.round(agree.cast("double") / n, 6).alias("po"),
        F.round(sp.cast("double") / (n * n), 6).alias("pe"),
        F.round(
            (agree * n - sp).cast("double") / F.nullif(n * n - sp, F.lit(0)),
            6,
        ).alias("kappa"),
    )


# ------------------------------------------------- tokenizer fertility
@_q(
    "q_tokenizer_fertility",
    f"""
    WITH {_PRED_SQL},
    st AS (SELECT doc_id, {ntok_sql('text')} AS ntok,
                  strlen(text) AS nbytes
           FROM documents),
    j AS (SELECT p.pred_lang, s.ntok, s.nbytes
          FROM pred p JOIN st s USING (doc_id))
    SELECT pred_lang,
           CAST(COUNT(*) AS bigint) AS n_docs,
           CAST(SUM(ntok) AS bigint) AS n_tokens,
           CAST(SUM(nbytes) AS bigint) AS n_bytes,
           CAST(CASE WHEN SUM(ntok) = 0 THEN 0
                ELSE SUM(nbytes) * 1000 // SUM(ntok) END AS bigint)
             AS bytes_per_token_milli
    FROM j GROUP BY pred_lang
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by predicted language: UTF-8 bytes per token
    for each language the classifier assigns — the report a tokenizer
    budget is planned from (a lang whose bytes/token runs hot inflates
    sequence lengths and training cost; multilingual corpora are
    budgeted in bytes, packed in tokens). Composes the TWO shared
    units: the stopword-vote predictor (_PRED_SQL / _langid_pred — the
    classifier every langid consumer evaluates) and THE corpus token
    rule (util.ntok_sql / ntok_col). Float discipline: the milli ratio
    is ONE integer division of exact bigint sums (zero-token classes
    pin 0). Shape: per-doc stats are in-row (no token-grain explode
    beyond the predictor's own stopword join); the doc-grain equi-join
    feeds an O(classes)-key partial agg — nothing wider than the
    predictor q_lang_id already runs."""
    pred = _langid_pred(spark, sf_dir)
    st = spread(load(spark, sf_dir, "documents").select("doc_id", "text")).select(
        "doc_id",
        ntok_col("text").alias("ntok"),
        F.octet_length("text").alias("nbytes"),
    )
    j = pred.join(st, "doc_id")
    agg = j.groupBy("pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ntok").cast("long").alias("n_tokens"),
        F.sum("nbytes").cast("long").alias("n_bytes"),
    )
    return agg.select(
        "pred_lang",
        "n_docs",
        "n_tokens",
        "n_bytes",
        F.expr(
            "CASE WHEN n_tokens = 0 THEN 0L"
            " ELSE n_bytes * 1000L div n_tokens END"
        )
        .cast("long")
        .alias("bytes_per_token_milli"),
    )


# --------------------------------------------------- len × quality grid
# the 2-D bucket rules — ONE rendering each, PURE-INTEGER derivations
# (no float bucket edges): length bins of 100 chars capped at 9;
# quality bins are deciles of the exact letter-count fraction via
# integer division (letters·10 // chars), capped at 9 so the
# all-letters row lands in the top cell, empty text pinned to cell 0.
_GRID_CAP = 9


def _len_bucket_sql(col: str) -> str:
    return f"LEAST({_GRID_CAP}, length({col}) // 100)"


def _len_bucket_col(col) -> F.Column:
    return F.least(
        F.lit(_GRID_CAP), F.expr(f"length({col}) div 100")
    ).cast("int")


def _q_bucket_sql(col: str) -> str:
    return (
        f"CASE WHEN length({col}) = 0 THEN 0 ELSE LEAST({_GRID_CAP},"
        f" (length({col}) - length(regexp_replace({col}, '[A-Za-z]',"
        f" '', 'g'))) * 10 // length({col})) END"
    )


def _q_bucket_col(col: str) -> F.Column:
    n = F.expr(f"length({col})")
    return (
        F.when(n == 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(_GRID_CAP),
                F.expr(
                    f"(length({col}) - length(regexp_replace({col},"
                    f" '[A-Za-z]', ''))) * 10 div length({col})"
                ),
            )
        )
        .cast("int")
    )


@_q(
    "q_len_quality_grid",
    f"""
    WITH f AS (
      SELECT CAST({_len_bucket_sql('text')} AS int) AS len_bucket,
             CAST({_q_bucket_sql('text')} AS int) AS q_bucket,
             {ntok_sql('text')} AS ntok
      FROM documents)
    SELECT len_bucket, q_bucket,
           CAST(COUNT(*) AS bigint) AS n_docs,
           CAST(SUM(ntok) AS bigint) AS n_tokens
    FROM f GROUP BY len_bucket, q_bucket
    """,
)
def q_len_quality_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D curation grid: document count and token mass per
    (length-bin × quality-decile) cell — the heatmap a threshold pair
    is picked from (q_threshold_yield sweeps one axis; this shows the
    joint surface, e.g. "short AND low-alpha" concentrating junk).
    Both bucket rules are ONE rendering per engine and PURE INTEGER —
    the quality decile is letters·10 // chars (exact counts, integer
    division), never a float bucket edge, so a document can never
    straddle cells across engines. Token mass uses THE corpus unit.
    Shape: in-row bucket derivation on the scan, one ≤100-key partial
    agg — the exchange moves O(grid) rows."""
    f = spread(
        load(spark, sf_dir, "documents").select("text")
    ).select(
        _len_bucket_col("text").alias("len_bucket"),
        _q_bucket_col("text").alias("q_bucket"),
        ntok_col("text").alias("ntok"),
    )
    return f.groupBy("len_bucket", "q_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ntok").cast("long").alias("n_tokens"),
    )


# ------------------------------------------------------- threshold sweep
# Curation planning: before committing to a quality threshold, a
# pipeline sweeps the whole grid and reads the yield curve — docs and
# tokens retained at every candidate cutoff — so the budget trade-off
# is decided from ONE corpus pass, not one pass per candidate. The
# score is the alpha ratio (shared rule with q_quality_score); the
# grid is 20 cutoffs at 0.05 spacing.
_YIELD_GRID = 20  # thresholds b/20 for b in 0..19


def alpha_score_sql(col: str) -> str:
    """ONE SQL rendering of the alpha-ratio quality score (round-6 of
    letter-chars / chars) — shared by q_threshold_yield and
    corpusops.q_mixing_plan. Caller guarantees length({col}) > 0 or
    wraps in a CASE."""
    return (
        f"ROUND(CAST(length({col}) - length(regexp_replace({col},"
        f" '[A-Za-z]', '', 'g')) AS double) / length({col}), 6)"
    )


def alpha_score_col(col):
    """Spark rendering of alpha_score_sql."""
    n = F.length(col)
    return F.round(
        (n - F.length(F.regexp_replace(col, "[A-Za-z]", "")))
        .cast("double")
        / n,
        6,
    )


@_q(
    "q_threshold_yield",
    f"""
    WITH scored AS (
      SELECT least(CAST(floor(
               {alpha_score_sql('text')} * {_YIELD_GRID})
               AS bigint), {_YIELD_GRID - 1}) AS b,
             {ntok_sql('text')} AS n_tok
      FROM documents WHERE length(text) > 0
    ),
    hist AS (
      SELECT b, CAST(COUNT(*) AS bigint) AS n_docs,
             CAST(SUM(n_tok) AS bigint) AS n_toks
      FROM scored GROUP BY b
    ),
    grid AS (
      SELECT g.b, COALESCE(h.n_docs, 0) AS n_docs,
             COALESCE(h.n_toks, 0) AS n_toks
      FROM (SELECT unnest(generate_series(0, {_YIELD_GRID - 1})) AS b) g
      LEFT JOIN hist h ON g.b = h.b
    )
    SELECT ROUND(b / {_YIELD_GRID}.0, 6) AS threshold,
           CAST(SUM(n_docs) OVER (ORDER BY b DESC
                ROWS UNBOUNDED PRECEDING) AS bigint) AS docs_retained,
           CAST(SUM(n_toks) OVER (ORDER BY b DESC
                ROWS UNBOUNDED PRECEDING) AS bigint) AS tokens_retained,
           ROUND(CAST(SUM(n_toks) OVER (ORDER BY b DESC
                        ROWS UNBOUNDED PRECEDING) AS double)
                 / nullif(SUM(n_toks) OVER (), 0), 6) AS token_frac
    FROM grid
    """,
)
def q_threshold_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yield curve of the alpha-ratio quality score: for each cutoff
    b/20, how many documents and tokens survive `score >= cutoff` —
    tokens in the same NON-EMPTY-word unit as q_mixture_alloc's avail
    and q_mixing_plan's toks, so the cutoff this curve selects
    corresponds exactly to the pool the plan grants against.

    Scale — one corpus pass: the score and its grid bucket are pure
    expressions on the scan, the histogram is a partial-aggregated
    groupBy collapsing to <= 20 rows map-side, and the suffix
    cumulative (retention is a >=-threshold, so it accumulates from
    the TOP bucket down) runs on that fixed 20-row frame — the same
    post-agg tiny-dim window as q_group_range. The grid left-join
    keeps empty buckets so the curve always has all 20 rows. The
    bucket is floor(round6(score) * 20) on both engines — identical
    doubles, identical floor."""
    docs = spread(load(spark, sf_dir, "documents").select("text"))
    n = F.length("text")
    score = alpha_score_col(F.col("text"))
    b = F.least(
        F.floor(score * _YIELD_GRID).cast("long"),
        F.lit(_YIELD_GRID - 1).cast("long"),
    )
    hist = (
        docs.where(n > 0)
        .select(
            b.alias("b"),
            ntok_col("text").cast("long").alias("n_tok"),
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_toks"),
        )
    )
    grid = docs.sparkSession.range(_YIELD_GRID).select(
        F.col("id").alias("b")
    )
    full = grid.join(hist, "b", "left").select(
        "b",
        F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        F.coalesce("n_toks", F.lit(0)).alias("n_toks"),
    )
    wsuf = Window.orderBy(F.desc("b")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    return full.select(
        F.round(F.col("b") / float(_YIELD_GRID), 6).alias("threshold"),
        F.sum("n_docs").over(wsuf).cast("long").alias("docs_retained"),
        F.sum("n_toks").over(wsuf).cast("long").alias("tokens_retained"),
        F.round(
            F.sum("n_toks").over(wsuf).cast("double")
            / F.nullif(F.sum("n_toks").over(wall), F.lit(0)),
            6,
        ).alias("token_frac"),
    )


# ------------------------------------------------ BPE merge candidates
# Vocabulary induction, round one: BPE training's first merge is the
# corpus-wide most frequent ADJACENT symbol pair inside words. This
# computes the top candidates from one pass — the exchange carries
# DISTINCT words (the word-frequency dim), never the raw token stream,
# because a word occurring 10^9 times contributes its pairs once with
# weight 10^9.
_BPE_TOPK = 20


@_q(
    "q_bpe_merge_candidates",
    f"""
    WITH w AS (
      SELECT t AS word, CAST(COUNT(*) AS bigint) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      WHERE t <> '' GROUP BY t
    ),
    p AS (
      SELECT substr(word, i, 2) AS pair, freq
      FROM w, LATERAL (
        SELECT unnest(generate_series(1, length(word) - 1)) AS i
      ) g
      WHERE length(word) >= 2
    )
    SELECT pair, CAST(SUM(freq) AS bigint) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair LIMIT {_BPE_TOPK}
    """,
)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 (_BPE_TOPK) adjacent character pairs by corpus frequency —
    the first-round BPE merge table.

    Scale — two partial-aggregated exchanges and a top-k: raw tokens
    collapse to the distinct-word frequency dim map-side; the in-row
    pair explode (a transform over an index sequence, zero Python)
    multiplies each distinct word by its length, not its count; the
    pair rollup collapses to O(alphabet²) rows map-side; and the
    ordered limit is a TakeOrderedAndProject, never a global sort.
    Ties break on the pair string so the cut is total-ordered."""
    docs = spread(load(spark, sf_dir, "documents").select("text"))
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    pairs = wf.where(F.length("word") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(_BPE_TOPK)
    )


# --------------------------------------------------- rare-token density
# Tail-vocabulary upsampling selector: documents dense in rare tokens
# carry the long-tail knowledge a proportional sampler under-trains
# on; curation pipelines upweight them (the inverse of the template /
# boilerplate downweights). Rarity is RELATIVE — a type is rare when
# its corpus count is at most 1/_RARE_DIV of the mean type count — so
# the rule is scale-invariant (an absolute cutoff silently selects
# nothing at 10x the corpus and everything at 1/10th).
_RARE_DIV = 10


@_q(
    "q_rare_token_docs",
    f"""
    WITH tk AS (
      SELECT doc_id, t
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
            FROM documents)
      WHERE t <> ''
    ),
    v AS (SELECT t, CAST(COUNT(*) AS bigint) AS cnt FROM tk GROUP BY t),
    s AS (SELECT CAST(SUM(cnt) AS bigint) AS total,
                 CAST(COUNT(*) AS bigint) AS n_types FROM v),
    r AS (SELECT t FROM v, s
          WHERE cnt * n_types * {_RARE_DIV} <= total),
    d AS (SELECT doc_id, CAST(COUNT(*) AS bigint) AS n_toks
          FROM tk GROUP BY doc_id),
    x AS (
      SELECT tk.doc_id,
             CAST(COUNT(*) AS bigint) AS n_rare,
             CAST(COUNT(DISTINCT tk.t) AS bigint) AS n_distinct_rare
      FROM tk JOIN r ON tk.t = r.t
      GROUP BY tk.doc_id
    )
    SELECT d.doc_id, d.n_toks, x.n_rare, x.n_distinct_rare,
           ROUND(CAST(x.n_rare AS double) / d.n_toks, 6) AS rare_ratio
    FROM d JOIN x ON d.doc_id = x.doc_id
    """,
)
def q_rare_token_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rare-token density: total tokens, rare-token hits
    (corpus count <= mean type count / 10, _RARE_DIV), distinct rare
    types, and the rare ratio — only documents with at least one rare
    token appear.

    Scale — the rarity test is an integer cross-multiplication against
    a ONE-ROW broadcast corpus-stats dim (total tokens, type count) —
    the scalar-broadcast pattern of q_unigram_logprob, no float drift,
    no vocab-wide window. The vocabulary dim is NOT broadcast (the
    tail is most of the vocabulary by type count at web scale): the
    token stream joins the pruned rare set on the token key, and AQE
    picks broadcast only when that set genuinely fits. Both rollups
    partial-aggregate map-side; output is doc-grain."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    tk = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).where(F.col("t") != "")
    v = tk.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    stats = v.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    rare = (
        v.crossJoin(F.broadcast(stats))
        .where(
            F.col("cnt") * F.col("n_types") * _RARE_DIV <= F.col("total")
        )
        .select("t")
    )
    d = tk.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_toks")
    )
    x = (
        tk.join(rare, "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rare"),
            F.countDistinct("t").cast("long").alias("n_distinct_rare"),
        )
    )
    return d.join(x, "doc_id").select(
        "doc_id",
        "n_toks",
        "n_rare",
        "n_distinct_rare",
        F.round(F.col("n_rare").cast("double") / F.col("n_toks"), 6).alias(
            "rare_ratio"
        ),
    )


# ----------------------------------------------------- seq-len waste curve
# Choosing max_seq_len is a throughput decision: pad-to-length burns
# sum(ceil(n/L)*L) - total tokens; concat-and-chop packing burns only
# the per-source block remainders. This curve prices both strategies on
# a fixed grid of candidate lengths in ONE corpus scan: per-source
# partial sums carry 1 + |grid| integer columns through the only
# exchange (O(sources) rows), the grid explode happens on that tiny
# dim, and waste fractions are exact integer milli. Token unit is the
# shared NON-EMPTY-word count (q_mixture_alloc / q_threshold_yield).
_SEQLEN_GRID = [128, 256, 512, 1024, 2048, 4096]


@_q(
    "q_seqlen_waste",
    f"""
    WITH d AS (
      SELECT source,
             {ntok_sql('text')} AS n
      FROM documents WHERE length(text) > 0
    ),
    g AS (SELECT unnest([{", ".join(map(str, _SEQLEN_GRID))}]) AS seq_len),
    pad AS (
      SELECT g.seq_len,
             CAST(SUM(d.n) AS bigint) AS total_tokens,
             CAST(SUM(((d.n + g.seq_len - 1) // g.seq_len) * g.seq_len)
                  AS bigint) AS pad_tokens
      FROM d, g GROUP BY g.seq_len
    ),
    st AS (SELECT source, SUM(n) AS tot FROM d GROUP BY source),
    pk AS (
      SELECT g.seq_len,
             CAST(SUM(((st.tot + g.seq_len - 1) // g.seq_len) * g.seq_len)
                  AS bigint) AS pack_tokens
      FROM st, g GROUP BY g.seq_len
    )
    SELECT CAST(pad.seq_len AS int) AS seq_len,
           pad.total_tokens,
           pad.pad_tokens,
           CAST((pad.pad_tokens - pad.total_tokens) * 1000 // pad.pad_tokens
                AS bigint) AS pad_waste_milli,
           pk.pack_tokens,
           CAST((pk.pack_tokens - pad.total_tokens) * 1000 // pk.pack_tokens
                AS bigint) AS pack_waste_milli
    FROM pad JOIN pk ON pad.seq_len = pk.seq_len
    """,
)
def q_seqlen_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-vs-packing waste per candidate max_seq_len: total tokens,
    padded tokens (each doc rounded up to L), packed tokens (each
    source's stream chopped into L-blocks), and both waste fractions in
    exact milli. The corpus scan computes, per source, ONE row of
    integer partials — sum(n) plus sum(ceil(n/L)*L) for every grid L as
    parallel aggregate columns (no doc x grid row inflation); the grid
    unpivot and the final rollup run on the O(sources) dim."""
    docs = spread(load(spark, sf_dir, "documents").select("source", "text"))
    n = ntok_col("text").cast("long")
    aggs = [F.sum("n").cast("long").alias("tot")]
    for L in _SEQLEN_GRID:
        # exact integer ceil-div — no double ever touches a token count
        aggs.append(
            F.sum(F.expr(f"((n + {L} - 1) div {L}) * {L}")).alias(
                f"pad_{L}"
            )
        )
    st = (
        docs.where(F.length("text") > 0)
        .withColumn("n", n)
        .groupBy("source")
        .agg(*aggs)
    )
    per_l = st.select(
        "source",
        "tot",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).alias("seq_len"),
                        F.col(f"pad_{L}").alias("pad"),
                        (
                            F.expr(f"(tot + {L} - 1) div {L}") * L
                        ).alias("pack"),
                    )
                    for L in _SEQLEN_GRID
                ]
            )
        ).alias("g"),
    ).select("tot", "g.*")
    agg = per_l.groupBy("seq_len").agg(
        F.sum("tot").cast("long").alias("total_tokens"),
        F.sum("pad").cast("long").alias("pad_tokens"),
        F.sum("pack").cast("long").alias("pack_tokens"),
    )
    return agg.select(
        F.col("seq_len").cast("int").alias("seq_len"),
        "total_tokens",
        "pad_tokens",
        F.expr("(pad_tokens - total_tokens) * 1000 div pad_tokens")
        .cast("long")
        .alias("pad_waste_milli"),
        "pack_tokens",
        F.expr("(pack_tokens - total_tokens) * 1000 div pack_tokens")
        .cast("long")
        .alias("pack_waste_milli"),
    )


# ------------------------------------------------- BPE encode application
# Applying the learned merge table is the other half of tokenization:
# q_bpe_merge_candidates INDUCES the round-1 merges; this operator
# ENCODES the corpus with them and reports per-document token counts —
# the number a context budget, packing plan, or price estimate actually
# needs. The merge table is a driver-side collect of the FIXED top-k
# (20 rows — sketch-sized, like the codebook collects) broadcast into
# ONE narrow Arrow stage; encoding caches by distinct word per batch,
# so cost tracks vocabulary, not token count. Greedy lowest-rank-first
# merging is the standard public BPE apply rule (Sennrich et al. 2016)
# restricted to the single-char round-1 table.
def bpe_encode_len(word: str, ranks: dict) -> int:
    """Symbol count of ``word`` after greedily applying ``ranks``
    (pair-string → rank, lower merges first): repeatedly find the
    lowest-rank adjacent single-char pair and merge ALL its
    non-overlapping occurrences left-to-right. Pure-Python spec shared
    by the operator and its pytest gate."""
    syms = list(word)
    while True:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            # round-1 merges are char+char: longer symbols never match
            if len(syms[i]) + len(syms[i + 1]) != 2:
                continue
            r = ranks.get(syms[i] + syms[i + 1])
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            return len(syms)
        out, i = [], 0
        while i < len(syms):
            if (
                i < len(syms) - 1
                and (syms[i], syms[i + 1]) == best_pair
            ):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out


def _q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE token counts under the induced round-1 merge
    table: words, chars, encoded tokens, and the milli compression
    ratio. Rows-only (iterative greedy merging is not SQL-expressible);
    the encode rule is pytest-gated against hand fixtures and a
    whole-corpus pure-Python recount."""
    rows = q_bpe_merge_candidates(spark, sf_dir).collect()
    ranks = {r.pair: i for i, r in enumerate(rows)}
    docs = spread(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )
    schema = (
        "doc_id bigint, n_words bigint, n_chars bigint, "
        "n_bpe_tokens bigint, compress_milli bigint"
    )

    def run(batches):
        cache: dict = {}

        def enc(word):
            v = cache.get(word)
            if v is None:
                v = cache[word] = bpe_encode_len(word, ranks)
            return v

        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                words = [w for w in (text or "").split(" ") if w]
                nc = sum(len(w) for w in words)
                nt = sum(enc(w) for w in words)
                out.append(
                    (
                        int(doc_id),
                        len(words),
                        nc,
                        nt,
                        (nt * 1000) // nc if nc else 0,
                    )
                )
            if out:
                yield pd.DataFrame(
                    out,
                    columns=[
                        "doc_id",
                        "n_words",
                        "n_chars",
                        "n_bpe_tokens",
                        "compress_milli",
                    ],
                )

    return docs.mapInPandas(run, schema=schema)


QUERIES["x_bpe_encode"] = _q_bpe_encode


# ------------------------------------------------- BPE trainer (full)
# The other other half: LEARNING the multi-round merge table — the
# actual tokenizer-training job a 100-TB pipeline runs. The public
# shape (Sennrich et al. 2016; every production trainer since) is
# two-phase and that split IS the scale design: the corpus-sized work
# is exactly ONE distributed word-frequency rollup (map-side combined;
# a word occurring 10^9 times crosses the wire once with weight 10^9),
# and the iterative merge loop runs on the collected top-K
# word-frequency DICT — O(cap × word_len × rounds) driver work that is
# independent of corpus size. The cap is not silent: the operator
# publishes cap_words and the milli fraction of total token mass the
# capped dict covers, so a release reviewer sees exactly what the
# vocabulary was trained on.
_BPE_TRAIN_ROUNDS = 12
_BPE_TRAIN_CAP = 4096  # distinct words kept for the driver dict


def bpe_train(
    word_freqs: list[tuple[str, int]], rounds: int
) -> list[tuple[int, str, str, str, int]]:
    """Pure-Python BPE trainer spec, shared by the operator and its
    pytest gate. Each round counts adjacent symbol pairs over the
    CURRENT segmentation of every distinct word (weighted by word
    frequency), merges the argmax pair — ties broken by the smaller
    (left, right) string pair so the table is total-ordered — and
    rewrites segmentations left-to-right non-overlapping. Returns
    (round, left, right, merged, pair_freq) rows; stops early when no
    adjacent pair remains."""
    from collections import Counter

    segs = {w: list(w) for w, _ in word_freqs}
    out: list[tuple[int, str, str, str, int]] = []
    for rnd in range(1, rounds + 1):
        counts: Counter = Counter()
        for w, f in word_freqs:
            syms = segs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        out.append((rnd, left, right, left + right, int(n)))
        for w in segs:
            syms = segs[w]
            if len(syms) < 2:
                continue
            merged, i = [], 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            segs[w] = merged
    return out


def _q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned {_BPE_TRAIN_ROUNDS}-round BPE merge table over the
    documents corpus, trained on the top-{_BPE_TRAIN_CAP} distinct
    words by (frequency, word) — one corpus exchange (the word
    rollup), a TakeOrderedAndProject cap (never a vocabulary sort),
    one 1-row total dim, then driver-side merge learning on the
    O(cap) dict. Rows-only (the merge loop is iterative); gated by a
    hand-derivable multi-round fixture, the tie-break law, and a
    whole-corpus pure-Python replay."""
    docs = spread(load(spark, sf_dir, "documents").select("text"))
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    top = (
        wf.orderBy(F.desc("freq"), F.asc("word"))
        .limit(_BPE_TRAIN_CAP)
        .collect()
    )
    total = wf.agg(F.sum("freq").alias("t")).collect()[0]["t"] or 0
    word_freqs = [(r["word"], int(r["freq"])) for r in top]
    covered = sum(f for _, f in word_freqs)
    merges = bpe_train(word_freqs, _BPE_TRAIN_ROUNDS)
    cap_words = len(word_freqs)
    cov_milli = (covered * 1000) // total if total else 0
    rows = [
        (rnd, lf, rt, mg, fq, cap_words, cov_milli)
        for rnd, lf, rt, mg, fq in merges
    ]
    schema = (
        "round int, left string, right string, merged string, "
        "pair_freq bigint, cap_words bigint, coverage_milli bigint"
    )
    return spark.createDataFrame(rows, schema=schema)


QUERIES["x_bpe_train"] = _q_bpe_train


# --------------------------------------------------- character entropy
# Per-document character-level Shannon entropy — the classic cheap
# gibberish / keyboard-mash / base64-blob screen (low entropy = one
# key held down or a template constant; implausibly high = encoded
# binary). Counts come from a FIXED 27-symbol alphabet (a-z, space)
# plus one "other" bucket, each count an in-row length difference —
# no char-grain explode exists anywhere, so the operator is a pure
# map over the corpus (zero shuffles; doc-grain output). Float
# discipline: every ln() argument is an exact integer count, the
# per-doc term chain is written as the SAME left-associated sum in
# both engines, and ROUND(.., 6) is applied once at the end (the
# q_source_kl precedent); the is_low verdict compares the UNROUNDED
# double, identical on both sides.
_ENT_CHARS = "abcdefghijklmnopqrstuvwxyz "
_ENT_FLOOR = 2.0  # nats; word-salad English sits ~2.8-3.0


def _entropy_sql() -> str:
    cnt = {
        c: f"(length(text) - length(replace(text, '{c}', '')))"
        for c in _ENT_CHARS
    }
    known = " + ".join(cnt.values())
    terms = []
    for c in _ENT_CHARS:
        terms.append(
            f"CASE WHEN {cnt[c]} > 0 THEN {cnt[c]} * ln({cnt[c]}) "
            "ELSE 0.0 END"
        )
    terms.append(
        f"CASE WHEN length(text) - ({known}) > 0 THEN "
        f"(length(text) - ({known})) * ln(length(text) - ({known})) "
        "ELSE 0.0 END"
    )
    s = " + ".join(terms)
    ent = f"CASE WHEN length(text) = 0 THEN 0.0 " \
          f"ELSE ln(length(text)) - ({s}) / length(text) END"
    return f"""
    SELECT doc_id,
           CAST(length(text) AS bigint) AS n_chars,
           ROUND({ent}, 6) AS entropy,
           ({ent}) < {_ENT_FLOOR} AS is_low
    FROM documents
    """


@_q("q_char_entropy", None)  # SQL attached below (generated rendering)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc character entropy over the fixed a-z+space alphabet plus
    an "other" bucket, flagging is_low below {_ENT_FLOOR} nats.

    Scale: the entire operator is in-row expression work — 28 length
    differences and 28 ln() terms per document, no explode, no join,
    no aggregation, no shuffle. At 100 TB this is a single map stage
    fused into whole-stage codegen; output is doc-grain and writes
    straight through. The "other" bucket keeps the partition exact:
    counts always sum to length(text), so H is the true character
    entropy, not an alphabet-restricted approximation."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    n = F.length("text")
    cnts = [
        n - F.length(F.replace(F.col("text"), F.lit(c))) for c in _ENT_CHARS
    ]
    known = cnts[0]
    for c in cnts[1:]:
        known = known + c
    cnts = cnts + [n - known]
    term = lambda c: F.when(  # noqa: E731
        c > 0, c.cast("double") * F.log(c.cast("double"))
    ).otherwise(F.lit(0.0))
    s = term(cnts[0])
    for c in cnts[1:]:
        s = s + term(c)
    ent = F.when(n == 0, F.lit(0.0)).otherwise(
        F.log(n.cast("double")) - s / n.cast("double")
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_chars"),
        F.round(ent, 6).alias("entropy"),
        (ent < _ENT_FLOOR).alias("is_low"),
    )


ORACLES["q_char_entropy"] = _entropy_sql()


# ----------------------------------------------- Gopher line-shape screen
# The Gopher rule family that is LINE-shaped rather than char-shaped
# (q_quality_score carries the char/word ratios): fraction of lines
# that are bullets, fraction that trail off in an ellipsis, and the
# within-document duplicate-line fraction. Runs over the shared
# synthetic line table (relational._synth_lines / _lines_sql — the
# same contract the hysteresis, plain-run and boilerplate-frequency
# operators are gated on) with a deterministic bullet/ellipsis
# decoration so the detectors have something real to find; ONE
# rendering of the decoration per engine, the no-drift discipline.
_SHAPE_BULLET_MAX = 900  # Gopher: drop if >90% bullet lines
_SHAPE_ELLIPSIS_MAX = 300  # Gopher: drop if >30% ellipsis lines
_SHAPE_DUP_MAX = 300  # Gopher-style: >30% duplicate lines


def _shape_line_sql() -> str:
    """DuckDB rendering of the decorated line (over lines(doc_id,li,s))."""
    return (
        "(CASE WHEN (doc_id + 2 * li) % 5 = 0 THEN '- ' || s ELSE s END)"
        " || (CASE WHEN (doc_id + 3 * li) % 7 = 1 THEN '...' ELSE '' END)"
    )


def _shape_line_col() -> F.Column:
    """Spark rendering of _shape_line_sql."""
    bullet = F.when(
        (F.col("doc_id") + 2 * F.col("li")) % 5 == 0,
        F.concat(F.lit("- "), F.col("s")),
    ).otherwise(F.col("s"))
    return F.concat(
        bullet,
        F.when(
            (F.col("doc_id") + 3 * F.col("li")) % 7 == 1, F.lit("...")
        ).otherwise(F.lit("")),
    )


def _shape_sql() -> str:
    from .relational import _lines_sql

    return f"""
    WITH {_lines_sql()},
    shaped AS (
      SELECT doc_id, {_shape_line_sql()} AS s2 FROM lines
    ),
    per AS (
      SELECT doc_id,
             CAST(COUNT(*) AS bigint) AS n_lines,
             CAST(SUM(CASE WHEN s2 LIKE '- %' THEN 1 ELSE 0 END)
                  AS bigint) AS n_bullet,
             CAST(SUM(CASE WHEN s2 LIKE '%...' THEN 1 ELSE 0 END)
                  AS bigint) AS n_ellipsis,
             CAST(COUNT(*) - COUNT(DISTINCT s2) AS bigint) AS n_dup
      FROM shaped GROUP BY doc_id
    )
    SELECT doc_id, n_lines,
           CAST(1000 * n_bullet // n_lines AS bigint) AS bullet_milli,
           CAST(1000 * n_ellipsis // n_lines AS bigint) AS ellipsis_milli,
           CAST(1000 * n_dup // n_lines AS bigint) AS dup_milli,
           (1000 * n_bullet // n_lines <= {_SHAPE_BULLET_MAX}
            AND 1000 * n_ellipsis // n_lines <= {_SHAPE_ELLIPSIS_MAX}
            AND 1000 * n_dup // n_lines <= {_SHAPE_DUP_MAX}) AS pass
    FROM per
    """


@_q("q_gopher_lineshape", None)  # SQL attached below (composes _lines_sql)
def q_gopher_lineshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Gopher line-shape screen: bullet-line, ellipsis-line and
    within-doc duplicate-line milli-fractions, with the pass verdict at
    the Gopher thresholds (bullet ≤ 900‰, ellipsis ≤ 300‰, dup ≤ 300‰).

    All three ratios are exact integer-milli (1000·x div n_lines — the
    integer-div rule, never float '/'+cast). Scale: line generation is
    an in-row transform + bounded explode (lines per doc ≤ len/5), the
    only exchange is the doc-keyed partial aggregation — document-
    bounded, never corpus-keyed; COUNT DISTINCT of line text within a
    doc is bounded by that doc's own line count. Output is doc-grain."""
    from .relational import _synth_lines

    lines = _synth_lines(spark, sf_dir).select(
        "doc_id", _shape_line_col().alias("s2")
    )
    n = F.count(F.lit(1)).cast("long")
    nb = F.sum(F.when(F.col("s2").startswith("- "), 1).otherwise(0))
    ne = F.sum(F.when(F.col("s2").endswith("..."), 1).otherwise(0))
    per = lines.groupBy("doc_id").agg(
        n.alias("n_lines"),
        nb.cast("long").alias("n_bullet"),
        ne.cast("long").alias("n_ellipsis"),
        (n - F.countDistinct("s2")).cast("long").alias("n_dup"),
    )
    milli = lambda c: F.expr(f"1000 * {c} div n_lines")  # noqa: E731
    return per.select(
        "doc_id",
        "n_lines",
        milli("n_bullet").alias("bullet_milli"),
        milli("n_ellipsis").alias("ellipsis_milli"),
        milli("n_dup").alias("dup_milli"),
        (
            (milli("n_bullet") <= _SHAPE_BULLET_MAX)
            & (milli("n_ellipsis") <= _SHAPE_ELLIPSIS_MAX)
            & (milli("n_dup") <= _SHAPE_DUP_MAX)
        ).alias("pass"),
    )


ORACLES["q_gopher_lineshape"] = _shape_sql()


# ------------------------------------------------- badwords lexicon screen
# The classic crawl-filter word-list screen (C4's badwords pass): count
# lexicon hits per document and flag above a milli threshold. The
# lexicon is a FIXTURE (real screens ship curated lists); the operator
# is the mechanics: an in-row membership filter against a literal
# array — no explode, no join, no shuffle, a pure map fused into
# codegen. Words not present in the corpus ('junk', 'spam') exercise
# the zero-hit path.
_BADWORDS = ["slow", "dup", "junk", "spam"]
_BADWORDS_SQL = "['" + "','".join(_BADWORDS) + "']"
_BAD_FLAG_MILLI = 40


@_q(
    "q_badwords_screen",
    f"""
    WITH t AS (
      SELECT doc_id,
             CAST({ntok_sql('text')} AS bigint) AS n_tokens,
             CAST(len(list_filter(
                    list_filter(string_split(text, ' '), x -> x <> ''),
                    x -> list_contains({_BADWORDS_SQL}, x)))
                  AS bigint) AS n_bad
      FROM documents
    )
    SELECT doc_id, n_tokens, n_bad,
           CAST(CASE WHEN n_tokens = 0 THEN 0
                     ELSE 1000 * n_bad // n_tokens END AS bigint)
             AS bad_milli,
           (CASE WHEN n_tokens = 0 THEN 0
                 ELSE 1000 * n_bad // n_tokens END) > {_BAD_FLAG_MILLI}
             AS flagged
    FROM t
    """,
)
def q_badwords_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc lexicon-hit count, exact integer-milli rate, and the
    >{_BAD_FLAG_MILLI}‰ flagged verdict against the _BADWORDS list —
    the C4-style badwords screen.

    Scale: one in-row filtered-membership count against a literal
    array per document (THE token unit via util.ntok_col for the
    denominator) — zero explode, zero join, zero shuffle; doc-grain
    output writes straight through. A production lexicon of ~1e3
    words stays a literal array (or a broadcast set for ~1e6)."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    bad = F.array(*[F.lit(w) for w in _BADWORDS])
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n_bad = F.size(F.filter(toks, lambda x: F.array_contains(bad, x)))
    n_tok = ntok_col("text")
    t = docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        n_bad.cast("long").alias("n_bad"),
    )
    milli = F.when(F.col("n_tokens") == 0, F.lit(0).cast("long")).otherwise(
        F.expr("1000 * n_bad div n_tokens")
    )
    return t.select(
        "doc_id",
        "n_tokens",
        "n_bad",
        milli.alias("bad_milli"),
        (milli > _BAD_FLAG_MILLI).alias("flagged"),
    )


# --------------------------------------------------- confusion matrix
@_q(
    "q_langid_confusion",
    f"""
    WITH {_PRED_CONF_SQL}
    SELECT lang AS declared, pred_lang AS predicted,
           CAST(n AS bigint) AS n
    FROM conf
    """,
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw classes² confusion matrix (declared × predicted counts)
    behind q_langid_eval and q_langid_kappa — the table a person
    debugging the classifier actually reads (WHICH class absorbs zh
    docs, not just that recall dropped). Same _PRED_CONF_SQL /
    _langid_pred rendering as both consumers, so the matrix can never
    disagree with the scorecard or the kappa. Scale: the predictor's
    (doc, lang) vote agg, then one O(classes²) rollup."""
    pred = _langid_pred(spark, sf_dir, cols=("doc_id", "lang"))
    return pred.groupBy(
        F.col("lang").alias("declared"),
        F.col("pred_lang").alias("predicted"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


# --------------------------------------------------- term burstiness
# Church–Gale burstiness: for each term, cf/df — the mean number of
# occurrences per document that contains it at all. Function words
# spread thinly (cf/df near 1); topical/template terms "burst" (a doc
# that mentions them once mentions them many times). Curation reads
# this next to q_boiler_linefreq: a high-burst, high-df term is
# boilerplate vocabulary; a high-burst, low-df term is a topic anchor.
# The ratio is EXACT integer milli (1000·cf div df) so a term can never
# straddle the verdict across engines.
_BURST_MIN_DF = 5  # df floor: sub-floor terms never leave the partial agg
_BURSTY_MILLI = 2000  # bursty ⇔ mean ≥ 2 occurrences per containing doc


@_q(
    "q_term_burstiness",
    f"""
    WITH occ AS (
      SELECT doc_id, w, CAST(COUNT(*) AS bigint) AS c
      FROM (SELECT doc_id,
                   unnest(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')) AS w
            FROM documents)
      GROUP BY doc_id, w),
    t AS (SELECT w, CAST(SUM(c) AS bigint) AS cf,
                 CAST(COUNT(*) AS bigint) AS df
          FROM occ GROUP BY w HAVING COUNT(*) >= {_BURST_MIN_DF})
    SELECT w AS term, cf, df,
           CAST(1000 * cf // df AS bigint) AS burst_milli,
           1000 * cf // df >= {_BURSTY_MILLI} AS bursty
    FROM t
    """,
)
def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term burstiness (Church & Gale): cf (corpus frequency), df
    (document frequency), burst_milli = 1000·cf div df, and the
    bursty verdict at ≥{_BURSTY_MILLI} milli (mean ≥2 occurrences per
    containing document). df floor {_BURST_MIN_DF} — rare terms carry
    no stable estimate and never leave the aggregation.

    Scale: one (doc_id, term) partial agg (map-side combined — a hot
    term collapses per task before the exchange), then the term-keyed
    rollup; output is O(vocabulary). The milli ratio and the verdict
    are exact integer arithmetic on both engines."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    occ = (
        docs.select(
            "doc_id",
            F.explode(
                F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
            ).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    t = (
        occ.groupBy("w")
        .agg(
            F.sum("c").cast("long").alias("cf"),
            F.count(F.lit(1)).cast("long").alias("df"),
        )
        .where(F.col("df") >= _BURST_MIN_DF)
    )
    milli = F.expr("1000 * cf div df").cast("long")
    return t.select(
        F.col("w").alias("term"),
        "cf",
        "df",
        milli.alias("burst_milli"),
        (milli >= _BURSTY_MILLI).alias("bursty"),
    )


# --------------------------------------------------- k-anonymity audit
# Release-governance screen: treating (source, lang, length-bin) as the
# quasi-identifier tuple, how many documents sit in equivalence classes
# smaller than k — i.e. are re-identifiable by their metadata alone?
# The length bin is THE shared grid rule (_len_bucket_sql /
# _len_bucket_col — pure integer, capped), so this audit can never
# disagree with the curation grid about which bin a document is in.
_KANON_K = 5


@_q(
    "q_k_anonymity",
    f"""
    WITH q AS (SELECT source, lang,
                      CAST({_len_bucket_sql('text')} AS int) AS len_bucket
               FROM documents),
    cls AS (SELECT source, lang, len_bucket,
                   CAST(COUNT(*) AS bigint) AS sz
            FROM q GROUP BY source, lang, len_bucket)
    SELECT source,
           CAST(SUM(sz) AS bigint) AS n_docs,
           CAST(COUNT(*) AS bigint) AS n_classes,
           CAST(MIN(sz) AS bigint) AS min_class,
           CAST(COALESCE(SUM(sz) FILTER (sz < {_KANON_K}), 0) AS bigint)
             AS n_risky,
           CAST(1000 * COALESCE(SUM(sz) FILTER (sz < {_KANON_K}), 0)
                // SUM(sz) AS bigint) AS risk_milli,
           MIN(sz) >= {_KANON_K} AS k_anonymous
    FROM cls GROUP BY source
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source k-anonymity (k={_KANON_K}) over the quasi-identifier
    (source, lang, len_bucket): class count, smallest class, documents
    in sub-k classes (n_risky), exact integer-milli risk rate, and the
    k_anonymous verdict (every class ≥ k). The length bin reuses the
    q_len_quality_grid rendering — ONE bucket rule per engine.

    Scale: QI derivation is in-row on the scan; one QI-keyed partial
    agg moves O(classes) rows; the per-source rollup is O(sources).
    No document-grain exchange anywhere."""
    q = spread(
        load(spark, sf_dir, "documents").select("source", "lang", "text")
    ).select("source", "lang", _len_bucket_col("text").alias("len_bucket"))
    cls = q.groupBy("source", "lang", "len_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    risky = F.coalesce(
        F.sum(F.when(F.col("sz") < _KANON_K, F.col("sz"))), F.lit(0)
    ).cast("long")
    return cls.groupBy("source").agg(
        F.sum("sz").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("sz").cast("long").alias("min_class"),
        risky.alias("n_risky"),
        F.expr(
            f"1000 * coalesce(sum(case when sz < {_KANON_K} then sz end),"
            " 0) div sum(sz)"
        )
        .cast("long")
        .alias("risk_milli"),
        (F.min("sz") >= _KANON_K).alias("k_anonymous"),
    )


# --------------------------------------------------- weighted median
# "The median DOCUMENT is 2 KB, but the median CHAR lives in a 40 KB
# document" — the char-weighted median is the length statistic that
# matches what a trainer actually ingests (tokens, not files), and
# the registry's unweighted quantiles cannot see it. Per source: the
# smallest n_chars L such that documents of length ≤ L hold at least
# HALF the source's total chars, integer-exact via the 2·cum ≥ total
# cross-multiplication (no floating halves). Scale: the corpus
# exchange is the map-side-combined per-(source, n_chars) rollup;
# the cumulative window walks that VALUE-DOMAIN dim (≤ distinct
# lengths per source — the q_skyline_docs bound), never documents.
@_q(
    "q_weighted_median",
    """
    WITH d AS (SELECT source, n_chars,
                      CAST(COUNT(*) AS bigint) AS n_docs,
                      CAST(SUM(n_chars) AS bigint) AS chars_at
               FROM documents GROUP BY 1, 2),
    c AS (SELECT source, n_chars, n_docs, chars_at,
                 SUM(chars_at) OVER (PARTITION BY source
                   ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_chars,
                 SUM(chars_at) OVER (PARTITION BY source) AS total_chars,
                 SUM(n_docs) OVER (PARTITION BY source) AS n_docs_src
          FROM d)
    SELECT source,
           CAST(n_docs_src AS bigint) AS n_docs,
           CAST(total_chars AS bigint) AS total_chars,
           CAST(MIN(CASE WHEN 2 * cum_chars >= total_chars
                         THEN n_chars END)
                OVER (PARTITION BY source) AS bigint) AS wmedian_len
    FROM c
    QUALIFY ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) = 1
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: doc count, total chars, and the char-weighted
    median document length (smallest L with 2·cum_chars(≤L) ≥ total).
    See family comment — dim-window only, integer-exact."""
    d = (
        load(spark, sf_dir, "documents")
        .groupBy("source", "n_chars")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_at"),
        )
    )
    wcum = (
        Window.partitionBy("source")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("source")
    c = d.select(
        "source",
        "n_chars",
        "n_docs",
        F.sum("chars_at").over(wcum).alias("cum_chars"),
        F.sum("chars_at").over(wall).alias("total_chars"),
        F.sum("n_docs").over(wall).alias("n_docs_src"),
    )
    out = c.select(
        "source",
        F.col("n_docs_src").cast("long").alias("n_docs"),
        F.col("total_chars").cast("long").alias("total_chars"),
        F.min(
            F.when(
                2 * F.col("cum_chars") >= F.col("total_chars"),
                F.col("n_chars"),
            )
        )
        .over(wall)
        .cast("long")
        .alias("wmedian_len"),
        F.row_number()
        .over(Window.partitionBy("source").orderBy("n_chars"))
        .alias("_rn"),
    )
    return out.where(F.col("_rn") == 1).drop("_rn")


# -------------------------------------------------- stump split scan
# The ML-primitive the registry lacked: the EXACT threshold-scan
# table a decision-stump (tree-node) learner consumes. For every
# candidate threshold t on n_chars: the left/right partition sizes
# and each side's sum of squared per-lang class counts — every
# impurity measure (Gini, entropy-gain after the caller's own log)
# derives from these four integers, and keeping the table integer
# avoids the argmin-tie instability a float impurity would smuggle
# across engines (the caller picks the argmin with whatever rational
# comparison it trusts). Scale: the ONLY corpus exchange is the
# map-side-combined (n_chars, lang) rollup; the threshold × lang grid
# is a dim product (value domain × classes), the cumulative windows
# walk it per lang, and the final rollup is per threshold — documents
# are never re-scanned per candidate, the trick that makes histogram
# tree learners (LightGBM-style) scale. Overflow: n_lc² wraps int64
# once a class's cumulative count passes ~3.04e9 docs (inside 100-TB
# reach), and Spark non-ANSI wraps SILENTLY where DuckDB's hugeint
# widens — so the squares go through decimal(19,0) operands (product
# decimal(38,0), exact to n_lc ~ 1e17 per class) before the final
# bigint cast, the same widening as q_lineitem_leverage's |leverage|
# sum (relational.py:6523).
@_q(
    "q_split_scan",
    """
    WITH d AS (SELECT n_chars, lang, CAST(COUNT(*) AS bigint) AS n
               FROM documents GROUP BY 1, 2),
    grid AS (SELECT t.n_chars, l.lang
             FROM (SELECT DISTINCT n_chars FROM d) t
             CROSS JOIN (SELECT DISTINCT lang FROM d) l),
    c AS (SELECT g.n_chars, g.lang,
                 SUM(COALESCE(d.n, 0)) OVER (PARTITION BY g.lang
                   ORDER BY g.n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS n_lc,
                 SUM(COALESCE(d.n, 0)) OVER (PARTITION BY g.lang)
                   AS n_c
          FROM grid g LEFT JOIN d
            ON d.n_chars = g.n_chars AND d.lang = g.lang)
    SELECT n_chars AS threshold,
           CAST(SUM(n_lc) AS bigint) AS n_left,
           CAST(SUM(n_c - n_lc) AS bigint) AS n_right,
           CAST(SUM(n_lc * n_lc) AS bigint) AS sumsq_left,
           CAST(SUM((n_c - n_lc) * (n_c - n_lc)) AS bigint)
             AS sumsq_right
    FROM c GROUP BY 1
    """,
)
def q_split_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per candidate threshold on n_chars: left/right sizes and each
    side's sum of squared per-lang class counts (docs with n_chars ≤
    t go left) — the exact-integer stump-learner input. See family
    comment."""
    d = (
        load(spark, sf_dir, "documents")
        .groupBy("n_chars", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    th = d.select("n_chars").distinct()
    lg = d.select("lang").distinct()
    grid = th.crossJoin(F.broadcast(lg))
    j = grid.join(d, ["n_chars", "lang"], "left").select(
        "n_chars", "lang", F.coalesce("n", F.lit(0)).alias("n")
    )
    wcum = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("lang")
    c = j.select(
        "n_chars",
        F.sum("n").over(wcum).alias("n_lc"),
        F.sum("n").over(wall).alias("n_c"),
    )
    n_lc_d = F.col("n_lc").cast("decimal(19,0)")
    n_rc_d = (F.col("n_c") - F.col("n_lc")).cast("decimal(19,0)")
    return c.groupBy(F.col("n_chars").alias("threshold")).agg(
        F.sum("n_lc").cast("long").alias("n_left"),
        F.sum(F.col("n_c") - F.col("n_lc")).cast("long").alias("n_right"),
        F.sum(n_lc_d * n_lc_d).cast("long").alias("sumsq_left"),
        F.sum(n_rc_d * n_rc_d).cast("long").alias("sumsq_right"),
    )
