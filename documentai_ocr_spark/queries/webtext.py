"""Web-text curation operators over the shared transcript turn stream:
URL/domain frequency (the blocklist/allowlist preflight every web-scale
corpus build runs), adjacent-turn echo rate (assistant parroting the
user — a transcript-quality signal), and a zlib compression-ratio
quality proxy (near-constant text compresses away; the classic cheap
low-quality detector).

Reference provenance: the reference pipeline's per-file charset /
content sniffing before OCR (/root/reference/pdf/tools.py:51-71 renames
on a content gate; /root/reference/ocrclient/redisdata.py tracks
per-file provenance) — here re-expressed as corpus-level preflight
reports over the turn stream.

Scale notes: every operator is turn-grain in-row work (regexp scan /
word-set ops / one Arrow batch pass) followed by a domain- or
conv-grain partial aggregation — no corpus-constant window keys, no
token-grain explodes (URL-grain explode is bounded by URLs per turn),
no collect beyond the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .relational import _TURN_BASE_SQL, _turn_base_col
from .util import load, ntok_col, ntok_sql, spread, words_sql

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, sql: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return reg


# ------------------------------------------------- shared turn stream
# The documents-as-conversations turn stream (12 turns per conversation,
# each an 8-word slice of the document — the same _TURN_BASE_SQL /
# _turn_base_col rendering the transcript family uses).
_TURNS_SQL = f"""tk AS (SELECT doc_id, string_split(text, ' ') AS tk
          FROM documents),
    turns AS (
      SELECT doc_id, g.t, {_TURN_BASE_SQL} AS base
      FROM tk, unnest(generate_series(0, 11)) g(t)
    )"""


def _turns_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _TURNS_SQL: (doc_id, t, base)."""
    docs = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    t = docs.select(
        "doc_id",
        F.split("text", " ").alias("tk"),
        F.explode(F.sequence(F.lit(0), F.lit(11))).alias("t"),
    )
    return t.select(
        "doc_id", "t", _turn_base_col(F.col("tk"), F.col("t")).alias("base")
    )


# ------------------------------------------------- URL decoration rule
# Deterministic link injection into turn text — ONE rendering per
# engine, the same no-drift discipline as the decimation/retry coins:
# every third (doc+t) turn carries an https link (23 domains), every
# seventh-mod-2 additionally an http link (13 domains), both embedded
# mid-sentence so extraction is a real regexp scan, not a column read.
_URL_TXT_SQL = (
    "base || CASE WHEN (doc_id + t) % 3 = 0 THEN ' see https://d' || "
    "CAST((doc_id * 7 + t) % 23 AS varchar) || '.example.com/p/' || "
    "CAST(t AS varchar) || ' ok' ELSE '' END || "
    "CASE WHEN (doc_id + t) % 7 = 2 THEN ' ref http://m' || "
    "CAST((doc_id * 11 + t) % 13 AS varchar) || '.test.org' "
    "ELSE '' END"
)


def _url_txt_col() -> F.Column:
    """Spark twin of _URL_TXT_SQL over (doc_id, t, base)."""
    https = F.concat(
        F.lit(" see https://d"),
        ((F.col("doc_id") * 7 + F.col("t")) % 23).cast("string"),
        F.lit(".example.com/p/"),
        F.col("t").cast("string"),
        F.lit(" ok"),
    )
    http = F.concat(
        F.lit(" ref http://m"),
        ((F.col("doc_id") * 11 + F.col("t")) % 13).cast("string"),
        F.lit(".test.org"),
    )
    return F.concat(
        F.col("base"),
        F.when((F.col("doc_id") + F.col("t")) % 3 == 0, https).otherwise(
            F.lit("")
        ),
        F.when((F.col("doc_id") + F.col("t")) % 7 == 2, http).otherwise(
            F.lit("")
        ),
    )


# RE2 (DuckDB) and java.util.regex (Spark) agree on this feature set:
# literal alternation, a plain character class, greedy +.
_URL_RE = "https?://[a-z0-9./-]+"
_DOMAIN_RE = "^https?://([a-z0-9.-]+)"

# ONE rendering of the decorate→extract→domain scan (turns → per-link
# (doc_id, domain) rows) — interpolated by q_url_domains,
# q_url_blocklist AND q_web_preflight so the link set can never drift
# between the sizing report, the pricing report and the composed gate.
_DOM_SQL = f"""ut AS (SELECT doc_id, t, {_URL_TXT_SQL} AS txt FROM turns),
    u AS (SELECT doc_id,
                 unnest(regexp_extract_all(txt, '{_URL_RE}')) AS url
          FROM ut),
    d AS (SELECT doc_id,
                 regexp_extract(url, '{_DOMAIN_RE}', 1) AS domain
          FROM u)"""


def _domains_df(
    spark: SparkSession, sf_dir: str, turns: DataFrame | None = None
) -> DataFrame:
    """Spark twin of _DOM_SQL: per-link (doc_id, domain). Pass an
    existing turns frame to share the scan lineage with other stages
    (the composed preflight does)."""
    if turns is None:
        turns = _turns_df(spark, sf_dir)
    ut = turns.select("doc_id", _url_txt_col().alias("txt"))
    u = ut.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("txt"), F.lit(_URL_RE), F.lit(0))
        ).alias("url"),
    )
    return u.select(
        "doc_id", F.regexp_extract("url", _DOMAIN_RE, 1).alias("domain")
    )


@_q(
    "q_url_domains",
    f"""
    WITH {_TURNS_SQL},
    {_DOM_SQL}
    SELECT domain,
           CAST(COUNT(*) AS bigint) AS n_urls,
           CAST(COUNT(DISTINCT doc_id) AS bigint) AS n_convs
    FROM d GROUP BY domain
    """,
)
def q_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain frequency report over links found in turn text — the
    preflight a web-corpus build runs before applying a domain
    blocklist/allowlist (which domains dominate, how many conversations
    cite each). Shape: in-row regexp_extract_all scan → URL-grain
    explode (bounded by links per turn) → domain-grain partial agg;
    the only exchange is on the O(domains) key. The txt column is the
    shared _URL_TXT_SQL decoration — the extraction regex must find
    exactly the links the rule injected, so the oracle gate doubles as
    a regex-parity proof between java.util.regex and RE2. The whole
    decorate→extract→domain scan is ONE rendering per engine
    (_DOM_SQL / _domains_df), shared with the blocklist family."""
    d = _domains_df(spark, sf_dir)
    return d.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.countDistinct("doc_id").cast("long").alias("n_convs"),
    )


# --------------------------------------------------- adjacent-turn echo
# the echo threshold (milli Jaccard) — shared by q_echo_rate's n_echo
# column and q_web_preflight's drop rule.
_ECHO_DROP_MILLI = 500

# ONE rendering of the adjacent-pair echo computation (turns →
# per-pair (doc_id, echo_milli)) — interpolated by q_echo_rate AND
# q_web_preflight so the screen applies exactly the statistic the
# report describes.
_ECHO_PAIRS_SQL = f"""w AS (SELECT doc_id, t,
                 list_distinct({words_sql('base')}) AS ws
          FROM turns),
    p AS (SELECT doc_id, t, ws,
                 lag(ws) OVER (PARTITION BY doc_id ORDER BY t) AS prev
          FROM w),
    j AS (SELECT doc_id, t,
                 len(list_filter(ws, x -> list_contains(prev, x)))
                   AS inter,
                 len(ws) + len(prev) AS tot
          FROM p WHERE prev IS NOT NULL),
    m AS (SELECT doc_id,
                 CASE WHEN tot - inter = 0 THEN 1000
                      ELSE inter * 1000 // (tot - inter) END AS echo_milli
          FROM j)"""


def _echo_pairs_df(turns: DataFrame) -> DataFrame:
    """Spark twin of _ECHO_PAIRS_SQL: per adjacent pair
    (doc_id, echo_milli)."""
    w = turns.select(
        "doc_id",
        "t",
        F.array_distinct(
            F.filter(F.split("base", " "), lambda x: x != "")
        ).alias("ws"),
    )
    win = Window.partitionBy("doc_id").orderBy("t")
    p = w.withColumn("prev", F.lag("ws").over(win)).where(
        F.col("prev").isNotNull()
    )
    j = p.select(
        "doc_id",
        F.size(F.array_intersect("ws", "prev")).alias("inter"),
        (F.size("ws") + F.size("prev")).alias("tot"),
    )
    return j.select(
        "doc_id",
        F.expr(
            "CASE WHEN tot - inter = 0 THEN 1000L"
            " ELSE inter * 1000L div (tot - inter) END"
        ).alias("echo_milli"),
    )


@_q(
    "q_echo_rate",
    f"""
    WITH {_TURNS_SQL},
    {_ECHO_PAIRS_SQL}
    SELECT doc_id,
           CAST(COUNT(*) AS bigint) AS n_pairs,
           CAST(MAX(echo_milli) AS bigint) AS max_echo_milli,
           CAST(SUM(echo_milli) // COUNT(*) AS bigint) AS mean_echo_milli,
           CAST(COUNT(*) FILTER (WHERE echo_milli >= {_ECHO_DROP_MILLI})
                AS bigint) AS n_echo
    FROM m GROUP BY doc_id
    """,
)
def q_echo_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-turn echo: distinct-word Jaccard between each turn and
    its predecessor within a conversation, rolled up per conversation
    (pair count, max / integer-mean milli echo, pairs ≥ 0.5). High echo
    marks parroting/loop transcripts that SFT curation drops. Word unit
    is THE shared corpus token rule (util.words_sql), deduplicated —
    Jaccard is a set statistic. Float discipline: the milli ratio is
    integer division of exact set sizes (|A∩B|·1000 // |A∪B| via
    union = |A|+|B|−|A∩B|); both-empty pairs define echo = 1000
    (identical empties). Shape: the lag window partitions on the
    conversation key (≤12 rows per partition — bounded by a turn cap,
    never by corpus size), then one conv-grain partial agg. The pair
    statistic is ONE rendering per engine (_ECHO_PAIRS_SQL /
    _echo_pairs_df), shared with the composed preflight gate."""
    m = _echo_pairs_df(_turns_df(spark, sf_dir))
    return m.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.max("echo_milli").cast("long").alias("max_echo_milli"),
        F.expr("sum(echo_milli) div count(1)")
        .cast("long")
        .alias("mean_echo_milli"),
        F.count_if(F.col("echo_milli") >= _ECHO_DROP_MILLI)
        .cast("long")
        .alias("n_echo"),
    )


# ------------------------------------------------ blocklist application
# THE blocklist rule — ONE rendering per engine: a domain is blocked
# iff its numeric id is ≡ 0 (mod 5). Over the injected domain space
# that blocks d{0,5,10,15,20}.example.com and m{0,5,10}.test.org, so
# both link families contribute blocked and allowed members.
_BLOCKED_NUM_RE = "[0-9]+"


def _blocked_sql(col: str) -> str:
    """DuckDB rendering of the blocklist membership test.

    TRY_CAST + COALESCE(…, FALSE): a digitless domain extracts '' and
    must read NOT BLOCKED on both engines — plain CAST('') hard-errors
    in DuckDB while Spark's cast yields NULL, so without TRY_CAST the
    two renderings diverge the first time a real corpus links to
    example.com."""
    return (
        f"COALESCE(TRY_CAST(regexp_extract({col}, '{_BLOCKED_NUM_RE}')"
        " AS bigint) % 5 = 0, FALSE)"
    )


def _blocked_col(col) -> F.Column:
    """Spark twin of _blocked_sql (same explicit digitless → FALSE).
    try_cast on this side too: under ANSI mode (Spark 4 default, this
    repo's sessions) a plain cast('') hard-errors just like DuckDB's
    CAST."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.regexp_extract(c, _BLOCKED_NUM_RE, 0).try_cast("long") % 5 == 0,
        F.lit(False),
    )


# ONE rendering of the per-conversation link accounting (domain scan →
# (doc_id, n_links, n_blocked)) — interpolated by q_url_blocklist AND
# q_web_preflight.
_LINKS_SQL = f"""{_DOM_SQL},
    f AS (SELECT doc_id,
                 COUNT(*) AS n_links,
                 COUNT(*) FILTER (WHERE {_blocked_sql('domain')})
                   AS n_blocked
          FROM d GROUP BY doc_id)"""


def _link_counts_df(
    spark: SparkSession, sf_dir: str, turns: DataFrame | None = None
) -> DataFrame:
    """Spark twin of _LINKS_SQL: (doc_id, n_links, n_blocked)."""
    return _domains_df(spark, sf_dir, turns).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.count_if(_blocked_col("domain")).alias("n_blocked"),
    )


@_q(
    "q_url_blocklist",
    f"""
    WITH {_TURNS_SQL},
    {_LINKS_SQL},
    c AS (SELECT dd.source,
                 COALESCE(f.n_links, 0) AS n_links,
                 COALESCE(f.n_blocked, 0) AS n_blocked
          FROM documents dd LEFT JOIN f USING (doc_id))
    SELECT source,
           CAST(COUNT(*) AS bigint) AS n_convs,
           CAST(COUNT(*) FILTER (WHERE n_links > 0) AS bigint) AS n_cited,
           CAST(COUNT(*) FILTER (WHERE n_blocked > 0) AS bigint)
             AS n_dropped,
           CAST(SUM(n_links) AS bigint) AS n_links,
           CAST(SUM(n_blocked) AS bigint) AS n_blocked_links,
           CAST((COUNT(*) - COUNT(*) FILTER (WHERE n_blocked > 0)) * 1000
                // COUNT(*) AS bigint) AS kept_milli
    FROM c GROUP BY source
    """,
)
def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist yield report: apply a domain blocklist to the link
    scan and report, per source, how many conversations survive a
    "drop any conversation citing a blocked domain" policy — the
    question a curation team answers BEFORE enforcing a blocklist
    (q_url_domains sizes the list; this prices it). Composes two
    shared rules with zero drift: the link decoration/extraction
    (_URL_TXT_SQL / _URL_RE — identical to q_url_domains) and THE
    blocklist test (_blocked_sql / _blocked_col). Float discipline:
    kept_milli is integer division of exact conversation counts.
    Shape: in-row regexp scan → URL-grain explode (bounded per turn) →
    conv-grain partial agg → left join back to the conversation dim →
    O(sources)-key agg; no corpus-constant window, no collect. The
    link accounting is ONE rendering per engine (_LINKS_SQL /
    _link_counts_df), shared with the composed preflight gate."""
    f = _link_counts_df(spark, sf_dir)
    docs = spread(
        load(spark, sf_dir, "documents").select("doc_id", "source")
    )
    c = docs.join(f, "doc_id", "left").select(
        "source",
        F.coalesce("n_links", F.lit(0)).alias("n_links"),
        F.coalesce("n_blocked", F.lit(0)).alias("n_blocked"),
    )
    agg = c.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.count_if(F.col("n_links") > 0).cast("long").alias("n_cited"),
        F.count_if(F.col("n_blocked") > 0).cast("long").alias("n_dropped"),
        F.sum("n_links").cast("long").alias("n_links"),
        F.sum("n_blocked").cast("long").alias("n_blocked_links"),
    )
    return agg.select(
        "source",
        "n_convs",
        "n_cited",
        "n_dropped",
        "n_links",
        "n_blocked_links",
        F.expr("(n_convs - n_dropped) * 1000L div n_convs")
        .cast("long")
        .alias("kept_milli"),
    )


# --------------------------------------------- first-turn prompt dedup
@_q(
    "q_instruction_dedup",
    f"""
    WITH {_TURNS_SQL},
    pr AS (SELECT doc_id,
                  MAX(CASE WHEN t = 0 THEN base END) AS prompt,
                  MAX(CASE WHEN t = 11 THEN base END) AS response
           FROM turns WHERE t IN (0, 11) GROUP BY doc_id)
    SELECT prompt,
           CAST(COUNT(*) AS bigint) AS n_convs,
           CAST(MIN(doc_id) AS bigint) AS keeper_doc,
           CAST(SUM({ntok_sql('response')}) AS bigint) AS resp_tokens,
           CAST(SUM({ntok_sql('response')}) * 1000 // COUNT(*) AS bigint)
             AS mean_resp_ntok_milli
    FROM pr WHERE prompt <> '' GROUP BY prompt
    """,
)
def q_instruction_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-turn prompt dedup: group conversations by their opening
    turn's text (the instruction), electing the smallest doc_id as the
    keeper — SFT curation's "same question asked N times, keep one,
    remember the demand" report (n_convs IS the demand signal for
    mixture weighting). Prompt/response are the shared turn rendering
    (_TURNS_SQL / _turns_df) at t=0 and t=11; response tokens use THE
    corpus token unit. Float discipline: the mean is integer division
    of exact sums. Shape: the t∈{{0,11}} filter prunes the turn explode
    12→2 rows per conversation before the conv-grain pivot agg; the
    prompt-grain exchange keys on the ≤8-word opening slice (bounded
    bytes — at scale you'd key its hash; the text itself IS the output
    here). Empty-text conversations (prompt='') are out of scope on
    both engines."""
    turns = _turns_df(spark, sf_dir).where(F.col("t").isin(0, 11))
    pr = turns.groupBy("doc_id").agg(
        F.max(F.when(F.col("t") == 0, F.col("base"))).alias("prompt"),
        F.max(F.when(F.col("t") == 11, F.col("base"))).alias("response"),
    )
    return (
        pr.where(F.col("prompt") != "")
        .groupBy("prompt")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.min("doc_id").cast("long").alias("keeper_doc"),
            F.sum(ntok_col("response")).cast("long").alias("resp_tokens"),
        )
        .select(
            "prompt",
            "n_convs",
            "keeper_doc",
            "resp_tokens",
            F.expr("resp_tokens * 1000L div n_convs")
            .cast("long")
            .alias("mean_resp_ntok_milli"),
        )
    )


# ------------------------------------------- per-turn-index length profile
@_q(
    "q_turnlen_profile",
    f"""
    WITH {_TURNS_SQL},
    n AS (SELECT t, {ntok_sql('base')} AS ntok FROM turns)
    SELECT CAST(t AS int) AS turn_idx,
           CAST(COUNT(*) AS bigint) AS n_turns,
           CAST(SUM(ntok) AS bigint) AS total_tokens,
           CAST(COUNT(*) FILTER (WHERE ntok = 0) AS bigint) AS n_empty,
           CAST(SUM(ntok) * 1000 // COUNT(*) AS bigint)
             AS mean_ntok_milli,
           CAST(MAX(ntok) AS bigint) AS max_ntok
    FROM n GROUP BY t
    """,
)
def q_turnlen_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-in-conversation length profile: token-count stats per
    turn index across all conversations — the report that spots
    systematic truncation (a cliff at the last index), template bloat
    (a fat index 0), and dead tail turns (n_empty rising with t)
    before a packing run wastes budget on them. Token unit is THE
    shared corpus rule (util.ntok_sql / ntok_col) over the shared turn
    rendering. Float discipline: the mean is ONE integer division of
    exact bigint sums. Shape: in-row token count on the turn stream,
    one 12-key partial agg — the exchange moves O(turn-cap) rows."""
    turns = _turns_df(spark, sf_dir)
    n = turns.select(
        F.col("t").cast("int").alias("turn_idx"),
        ntok_col("base").alias("ntok"),
    )
    return n.groupBy("turn_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("ntok").cast("long").alias("total_tokens"),
        F.count_if(F.col("ntok") == 0).cast("long").alias("n_empty"),
        F.expr("sum(ntok) * 1000L div count(1)")
        .cast("long")
        .alias("mean_ntok_milli"),
        F.max("ntok").cast("long").alias("max_ntok"),
    )


# ------------------------------------------------- role token share
# THE role rule over the turn grid — ONE rendering per engine, the
# SAME user/assistant/tool cycle the transcript synthesizer assigns
# (synth._ROLES[t % 3]), so the oracled family and the x_extract_*
# family describe the same conversation shape.
_ROLE_SQL = (
    "CASE t % 3 WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'"
    " ELSE 'tool' END"
)


def _role_col() -> F.Column:
    """Spark twin of _ROLE_SQL over the turn-index column."""
    return (
        F.when(F.col("t") % 3 == 0, F.lit("user"))
        .when(F.col("t") % 3 == 1, F.lit("assistant"))
        .otherwise(F.lit("tool"))
    )


@_q(
    "q_role_token_share",
    f"""
    WITH {_TURNS_SQL},
    rt AS (SELECT doc_id, {_ROLE_SQL} AS role,
                  {ntok_sql('base')} AS ntok
           FROM turns),
    cg AS (SELECT doc_id,
                  SUM(CASE WHEN role = 'user' THEN ntok ELSE 0 END)
                    AS user_tok,
                  SUM(CASE WHEN role = 'assistant' THEN ntok ELSE 0 END)
                    AS asst_tok,
                  SUM(CASE WHEN role = 'tool' THEN ntok ELSE 0 END)
                    AS tool_tok
           FROM rt GROUP BY doc_id),
    j AS (SELECT d.source, c.user_tok, c.asst_tok, c.tool_tok
          FROM documents d JOIN cg c USING (doc_id))
    SELECT source,
           CAST(COUNT(*) AS bigint) AS n_convs,
           CAST(SUM(user_tok) AS bigint) AS user_tokens,
           CAST(SUM(asst_tok) AS bigint) AS asst_tokens,
           CAST(SUM(tool_tok) AS bigint) AS tool_tokens,
           CAST(CASE WHEN SUM(user_tok) + SUM(asst_tok) + SUM(tool_tok) = 0
                THEN 0
                ELSE SUM(asst_tok) * 1000
                     // (SUM(user_tok) + SUM(asst_tok) + SUM(tool_tok))
                END AS bigint) AS asst_share_milli
    FROM j GROUP BY source
    """,
)
def q_role_token_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role token budget per source: how many tokens each source spends
    on user vs assistant vs tool turns, and the assistant's share — the
    report an SFT loss-masking plan is priced from (only assistant
    tokens carry gradient; a source that is mostly tool output trains
    almost nothing). Role is ONE shared rule (_ROLE_SQL / _role_col —
    the synthesizer's own t%3 cycle) over the shared turn rendering;
    tokens are THE corpus unit. Float discipline: the share is ONE
    integer division of exact bigint sums (all-empty source pins 0).
    Shape: in-row role/token derivation on the turn stream → conv-grain
    partial agg → equi-join to the conversation dim → O(sources) keys;
    no corpus-constant window."""
    turns = _turns_df(spark, sf_dir)
    rt = turns.select(
        "doc_id",
        _role_col().alias("role"),
        ntok_col("base").alias("ntok"),
    )
    cg = rt.groupBy("doc_id").agg(
        F.sum(F.when(F.col("role") == "user", F.col("ntok")).otherwise(0))
        .alias("user_tok"),
        F.sum(
            F.when(F.col("role") == "assistant", F.col("ntok")).otherwise(0)
        ).alias("asst_tok"),
        F.sum(F.when(F.col("role") == "tool", F.col("ntok")).otherwise(0))
        .alias("tool_tok"),
    )
    docs = spread(
        load(spark, sf_dir, "documents").select("doc_id", "source")
    )
    j = docs.join(cg, "doc_id")
    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.sum("user_tok").cast("long").alias("user_tokens"),
        F.sum("asst_tok").cast("long").alias("asst_tokens"),
        F.sum("tool_tok").cast("long").alias("tool_tokens"),
    )
    return agg.select(
        "source",
        "n_convs",
        "user_tokens",
        "asst_tokens",
        "tool_tokens",
        F.expr(
            "CASE WHEN user_tokens + asst_tokens + tool_tokens = 0 THEN 0L"
            " ELSE asst_tokens * 1000L"
            " div (user_tokens + asst_tokens + tool_tokens) END"
        )
        .cast("long")
        .alias("asst_share_milli"),
    )


# ------------------------------------------- prefix-alive conversation funnel
@_q(
    "q_conv_retention",
    f"""
    WITH {_TURNS_SQL},
    nt AS (SELECT doc_id, t, {ntok_sql('base')} AS ntok FROM turns),
    ff AS (SELECT doc_id,
                  COALESCE(MIN(CASE WHEN ntok = 0 THEN t END), 12)
                    AS first_fail
           FROM nt GROUP BY doc_id),
    hb AS (SELECT first_fail, CAST(COUNT(*) AS bigint) AS c
           FROM ff GROUP BY first_fail),
    tot AS (SELECT CAST(COUNT(*) AS bigint) AS n_total FROM ff),
    grid AS (SELECT g.t AS turn_idx
             FROM unnest(generate_series(0, 11)) g(t)),
    al AS (SELECT grid.turn_idx, COALESCE(SUM(hb.c), 0) AS n_alive
           FROM grid LEFT JOIN hb ON hb.first_fail > grid.turn_idx
           GROUP BY grid.turn_idx)
    SELECT CAST(al.turn_idx AS int) AS turn_idx,
           CAST(al.n_alive AS bigint) AS n_alive,
           CAST(al.n_alive * 1000 // tot.n_total AS bigint)
             AS retention_milli
    FROM al, tot
    """,
)
def q_conv_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-alive conversation funnel: at each turn index t, how many
    conversations still have NO empty turn anywhere in 0..t — the
    monotone retention curve a turn-count cap is chosen from (unlike
    q_turnlen_profile's per-position n_empty, this is cumulative: one
    dead turn kills the conversation for every later index). Shape:
    in-row token counts → conv-grain first-failure index (one partial
    agg) → a ≤13-row failure histogram; the funnel itself is a tiny
    grid⋈histogram suffix-sum plus a 1-row total dim — the same
    bounded post-aggregation pattern as q_threshold_yield, never the
    corpus. Float discipline: retention is ONE integer division of
    exact conversation counts."""
    turns = _turns_df(spark, sf_dir)
    nt = turns.select("doc_id", "t", ntok_col("base").alias("ntok"))
    ff = nt.groupBy("doc_id").agg(
        F.coalesce(
            F.min(F.when(F.col("ntok") == 0, F.col("t"))), F.lit(12)
        ).alias("first_fail")
    )
    hb = ff.groupBy("first_fail").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = ff.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    grid = spark.range(0, 12).select(
        F.col("id").cast("int").alias("turn_idx")
    )
    al = (
        grid.join(
            F.broadcast(hb),
            hb["first_fail"] > grid["turn_idx"],
            "left",
        )
        .groupBy("turn_idx")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_alive"))
    )
    return al.crossJoin(F.broadcast(tot)).select(
        "turn_idx",
        F.col("n_alive").cast("long").alias("n_alive"),
        F.expr("n_alive * 1000L div n_total")
        .cast("long")
        .alias("retention_milli"),
    )


# ------------------------------------------- composed web-preflight gate
@_q(
    "q_web_preflight",
    f"""
    WITH {_TURNS_SQL},
    {_LINKS_SQL},
    {_ECHO_PAIRS_SQL},
    e AS (SELECT doc_id, MAX(echo_milli) AS max_echo
          FROM m GROUP BY doc_id),
    c AS (SELECT dd.source, {ntok_sql('dd.text')} AS ntok,
                 COALESCE(f.n_blocked, 0) > 0 AS url_drop,
                 COALESCE(e.max_echo, 0) >= {_ECHO_DROP_MILLI}
                   AS echo_bad
          FROM documents dd
          LEFT JOIN f USING (doc_id)
          LEFT JOIN e USING (doc_id))
    SELECT source,
           CAST(COUNT(*) AS bigint) AS n_convs,
           CAST(COUNT(*) FILTER (WHERE url_drop) AS bigint) AS drop_url,
           CAST(COUNT(*) FILTER (WHERE NOT url_drop AND echo_bad)
                AS bigint) AS drop_echo,
           CAST(COUNT(*) FILTER (WHERE NOT url_drop AND NOT echo_bad)
                AS bigint) AS n_kept,
           CAST(COALESCE(SUM(ntok) FILTER
                  (WHERE NOT url_drop AND NOT echo_bad), 0) AS bigint)
             AS kept_tokens,
           CAST(COUNT(*) FILTER (WHERE NOT url_drop AND NOT echo_bad)
                * 1000 // COUNT(*) AS bigint) AS kept_milli
    FROM c GROUP BY source
    """,
)
def q_web_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed web-corpus preflight: blocklist drop → echo screen →
    per-source yield, as ONE pipeline — the end-to-end answer to "what
    survives if we enforce both policies", with waterfall accounting
    (a conversation dropped by the blocklist is NOT double-counted by
    the echo stage). Every stage rule is the SAME rendering its
    standalone report uses: link accounting _LINKS_SQL/_link_counts_df
    (so drop_url reconciles EXACTLY with q_url_blocklist.n_dropped),
    the echo pair statistic _ECHO_PAIRS_SQL/_echo_pairs_df and the
    shared _ECHO_DROP_MILLI threshold (so the screen applies exactly
    what q_echo_rate reports), and THE corpus token unit for the kept
    yield. Float discipline: kept_milli is ONE integer division of
    exact counts. Shape: two conv-grain partial aggs left-joined to
    the conversation dim, then O(sources) keys — the composition adds
    no exchange the standalone reports don't already run, and both
    stages derive from ONE turns frame (shared scan lineage)."""
    turns = _turns_df(spark, sf_dir)
    f = _link_counts_df(spark, sf_dir, turns)
    e = (
        _echo_pairs_df(turns)
        .groupBy("doc_id")
        .agg(F.max("echo_milli").alias("max_echo"))
    )
    docs = spread(
        load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    c = (
        docs.join(f, "doc_id", "left")
        .join(e, "doc_id", "left")
        .select(
            "source",
            ntok_col("text").alias("ntok"),
            (F.coalesce("n_blocked", F.lit(0)) > 0).alias("url_drop"),
            (
                F.coalesce("max_echo", F.lit(0)) >= _ECHO_DROP_MILLI
            ).alias("echo_bad"),
        )
    )
    kept = ~F.col("url_drop") & ~F.col("echo_bad")
    agg = c.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.count_if(F.col("url_drop")).cast("long").alias("drop_url"),
        F.count_if(~F.col("url_drop") & F.col("echo_bad"))
        .cast("long")
        .alias("drop_echo"),
        F.count_if(kept).cast("long").alias("n_kept"),
        F.coalesce(F.sum(F.when(kept, F.col("ntok"))), F.lit(0))
        .cast("long")
        .alias("kept_tokens"),
    )
    return agg.select(
        "source",
        "n_convs",
        "drop_url",
        "drop_echo",
        "n_kept",
        "kept_tokens",
        F.expr("n_kept * 1000L div n_convs")
        .cast("long")
        .alias("kept_milli"),
    )


# --------------------------------------------- compression-ratio proxy
# zlib level is pinned: the ratio must be bit-stable across runs and
# across the pytest recount.
_ZLIB_LEVEL = 6


def _compress_len(text: str) -> int:
    """THE compressed-size rule (shared with the pytest recount):
    zlib at the pinned level over UTF-8 bytes."""
    import zlib

    return len(zlib.compress(text.encode("utf-8"), _ZLIB_LEVEL))


def _x_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality proxy: per document, UTF-8 byte length,
    zlib-compressed length, and the milli ratio (compressed·1000 //
    raw). Repetitive/templated text lands far below natural prose — the
    cheap low-quality screen that runs before any model-based scorer.

    Not SQL-expressible (DuckDB has no zlib) → rows-only registry entry;
    the pytest recount recomputes _compress_len in pure Python over the
    whole sf0.001 corpus. Shape: one Arrow-batched pandas UDF on the
    scan (narrow, zero shuffle — scales with input splits); raw length
    stays a JVM-side octet_length so only the compressor crosses the
    Python boundary."""

    @F.pandas_udf("long")
    def comp_len(s):
        return s.map(_compress_len)

    d = spread(load(spark, sf_dir, "documents").select("doc_id", "text"))
    return d.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("raw_bytes"),
        comp_len("text").alias("comp_bytes"),
    ).select(
        "doc_id",
        "raw_bytes",
        "comp_bytes",
        F.expr(
            "CASE WHEN raw_bytes = 0 THEN 1000L"
            " ELSE comp_bytes * 1000L div raw_bytes END"
        )
        .cast("long")
        .alias("ratio_milli"),
    )


QUERIES["x_compression_ratio"] = _x_compression_ratio


# ------------------------------------------------ within-conv word novelty
@_q(
    "q_turn_novelty",
    f"""
    WITH {_TURNS_SQL},
    tw AS (SELECT doc_id, t, unnest(list_distinct({words_sql('base')}))
             AS w
           FROM turns),
    fo AS (SELECT doc_id, w, MIN(t) AS first_t
           FROM tw GROUP BY doc_id, w),
    per AS (SELECT tw.doc_id, tw.t,
                   COUNT(*) AS n_words,
                   COUNT(*) FILTER (WHERE fo.first_t = tw.t) AS n_new
            FROM tw JOIN fo ON tw.doc_id = fo.doc_id AND tw.w = fo.w
            GROUP BY tw.doc_id, tw.t)
    SELECT CAST(t AS int) AS turn_idx,
           CAST(COUNT(*) AS bigint) AS n_turns,
           CAST(SUM(n_words) AS bigint) AS n_words,
           CAST(SUM(n_new) AS bigint) AS n_new,
           CAST(SUM(n_new) * 1000 // SUM(n_words) AS bigint)
             AS novelty_milli
    FROM per GROUP BY t
    """,
)
def q_turn_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-conversation vocabulary novelty by turn position: of the
    distinct words a turn uses, how many appear for the FIRST time in
    that conversation — the new-information rate that separates
    conversations that go somewhere from loops (q_echo_rate reads
    adjacent-pair similarity; this reads global within-conv novelty).
    Word unit is THE shared corpus rule, deduplicated per turn. Float
    discipline: novelty is ONE integer division of exact counts per
    position. Shape: turn-grain distinct-word explode (bounded by 8
    words/turn) → (conv, word) first-occurrence partial agg → equi-join
    back → 12-key rollup; every exchange keys on conv or (conv, word),
    never a corpus-constant column. Turns with zero words contribute
    no row (per-grain explode), so n_turns counts word-bearing turns —
    same convention on both engines."""
    turns = _turns_df(spark, sf_dir)
    tw = turns.select(
        "doc_id",
        "t",
        F.explode(
            F.array_distinct(
                F.filter(F.split("base", " "), lambda x: x != "")
            )
        ).alias("w"),
    )
    fo = tw.groupBy("doc_id", "w").agg(F.min("t").alias("first_t"))
    per = (
        tw.join(fo, ["doc_id", "w"])
        .groupBy("doc_id", "t")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.count_if(F.col("first_t") == F.col("t")).alias("n_new"),
        )
    )
    return (
        per.groupBy(F.col("t").cast("int").alias("turn_idx"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_new").cast("long").alias("n_new"),
        )
        .select(
            "turn_idx",
            "n_turns",
            "n_words",
            "n_new",
            F.expr("n_new * 1000L div n_words")
            .cast("long")
            .alias("novelty_milli"),
        )
    )


# ------------------------------------------------ drift from the opening turn
@_q(
    "q_topic_drift",
    f"""
    WITH {_TURNS_SQL},
    w AS (SELECT doc_id, t,
                 list_distinct({words_sql('base')}) AS ws
          FROM turns),
    a AS (SELECT doc_id, t, ws,
                 first_value(ws) OVER (PARTITION BY doc_id ORDER BY t)
                   AS anchor
          FROM w),
    j AS (SELECT doc_id, t,
                 len(list_filter(ws, x -> list_contains(anchor, x)))
                   AS inter,
                 len(ws) + len(anchor) AS tot
          FROM a WHERE t > 0),
    m AS (SELECT doc_id, t,
                 CASE WHEN tot - inter = 0 THEN 1000
                      ELSE inter * 1000 // (tot - inter) END AS sim_milli
          FROM j)
    SELECT CAST(t AS int) AS turn_idx,
           CAST(COUNT(*) AS bigint) AS n_convs,
           CAST(SUM(sim_milli) // COUNT(*) AS bigint) AS mean_sim_milli,
           CAST(COUNT(*) FILTER (WHERE sim_milli = 0) AS bigint)
             AS n_disjoint
    FROM m GROUP BY t
    """,
)
def q_topic_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic drift from the opening turn: distinct-word Jaccard between
    each later turn and turn 0, aggregated by position — the curve that
    shows how fast conversations leave their opening topic (flat-high =
    on-task or looping, falling = drift, n_disjoint = turns sharing
    NOTHING with the opener). Complements q_echo_rate (adjacent pairs)
    and q_turn_novelty (first occurrences) over the SAME turn rendering
    and THE same word unit, with the same both-empty=1000 convention
    and integer-milli set arithmetic. Shape: the anchor is a
    first_value window over the conversation key (≤12 rows per
    partition), then one 11-key rollup."""
    turns = _turns_df(spark, sf_dir)
    w = turns.select(
        "doc_id",
        "t",
        F.array_distinct(
            F.filter(F.split("base", " "), lambda x: x != "")
        ).alias("ws"),
    )
    win = Window.partitionBy("doc_id").orderBy("t")
    a = w.withColumn("anchor", F.first("ws").over(win)).where(
        F.col("t") > 0
    )
    j = a.select(
        "doc_id",
        "t",
        F.size(F.array_intersect("ws", "anchor")).alias("inter"),
        (F.size("ws") + F.size("anchor")).alias("tot"),
    )
    m = j.select(
        "t",
        F.expr(
            "CASE WHEN tot - inter = 0 THEN 1000L"
            " ELSE inter * 1000L div (tot - inter) END"
        ).alias("sim_milli"),
    )
    return m.groupBy(F.col("t").cast("int").alias("turn_idx")).agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.expr("sum(sim_milli) div count(1)")
        .cast("long")
        .alias("mean_sim_milli"),
        F.count_if(F.col("sim_milli") == 0).cast("long").alias("n_disjoint"),
    )


# --------------------------------------------- domain reputation gate
# Per-conversation quality in integer milli — letters·1000 // chars,
# empty text pinned to 0. ONE rendering per engine; the finer-grid
# sibling of textstats' decile rule (_q_bucket_sql: letters·10 //
# chars) — same exact-integer family, never a float edge.
def _qual_milli_sql(col: str) -> str:
    return (
        f"CASE WHEN length({col}) = 0 THEN 0 ELSE"
        f" (length({col}) - length(regexp_replace({col}, '[A-Za-z]',"
        f" '', 'g'))) * 1000 // length({col}) END"
    )


def _qual_milli_col(col: str) -> F.Column:
    n = F.expr(f"length({col})")
    return (
        F.when(n == 0, F.lit(0))
        .otherwise(
            F.expr(
                f"(length({col}) - length(regexp_replace({col},"
                f" '[A-Za-z]', ''))) * 1000 div length({col})"
            )
        )
        .cast("long")
    )


# minimum linking-conversation support before a domain can be blocked
# (below it there is no evidence either way — default allow).
_REP_MIN_CONVS = 5

# ONE rendering of the reputation table (link scan → per-domain
# conv support, link count, mean linking-conv quality, verdict) —
# interpolated by q_domain_reputation AND q_reputation_gate so the
# gate blocks exactly the domains the report says it will. The
# corpus anchor is the incidence-weighted mean (each conversation
# counted once per domain it cites), floored to milli on BOTH
# engines before the comparison, so the verdict is a pure integer
# rule with no cross-engine float edge.
_REP_SQL = f"""{_DOM_SQL},
    q AS (SELECT doc_id, {_qual_milli_sql('text')} AS qual
          FROM documents),
    dl AS (SELECT domain, doc_id, COUNT(*) AS n_links
           FROM d GROUP BY domain, doc_id),
    rep AS (SELECT domain,
                   COUNT(*) AS n_convs,
                   SUM(dl.n_links) AS n_links,
                   SUM(q.qual) AS sum_qual
            FROM dl JOIN q USING (doc_id) GROUP BY domain),
    tot AS (SELECT SUM(sum_qual) // SUM(n_convs) AS anchor_milli
            FROM rep),
    v AS (SELECT domain, n_convs, n_links,
                 sum_qual // n_convs AS mean_qual_milli,
                 CASE WHEN n_convs >= {_REP_MIN_CONVS}
                       AND sum_qual // n_convs < tot.anchor_milli
                      THEN 'block' ELSE 'allow' END AS verdict
          FROM rep, tot)"""


def _reputation_df(
    spark: SparkSession, sf_dir: str, turns: DataFrame | None = None
) -> DataFrame:
    """Spark twin of _REP_SQL: per-domain
    (domain, n_convs, n_links, mean_qual_milli, verdict)."""
    d = _domains_df(spark, sf_dir, turns)
    q = spread(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    ).select("doc_id", _qual_milli_col("text").alias("qual"))
    dl = d.groupBy("domain", "doc_id").agg(
        F.count(F.lit(1)).alias("n_links")
    )
    rep = dl.join(q, "doc_id").groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_convs"),
        F.sum("n_links").alias("n_links"),
        F.sum("qual").alias("sum_qual"),
    )
    tot = rep.agg(
        F.expr("sum(sum_qual) div sum(n_convs)").alias("anchor_milli")
    )
    return rep.crossJoin(F.broadcast(tot)).select(
        "domain",
        F.col("n_convs").cast("long").alias("n_convs"),
        F.col("n_links").cast("long").alias("n_links"),
        F.expr("sum_qual div n_convs").cast("long").alias(
            "mean_qual_milli"
        ),
        F.when(
            (F.col("n_convs") >= _REP_MIN_CONVS)
            & (F.expr("sum_qual div n_convs") < F.col("anchor_milli")),
            F.lit("block"),
        )
        .otherwise(F.lit("allow"))
        .alias("verdict"),
    )


@_q(
    "q_domain_reputation",
    f"""
    WITH {_TURNS_SQL},
    {_REP_SQL}
    SELECT domain, CAST(n_convs AS bigint) AS n_convs,
           CAST(n_links AS bigint) AS n_links,
           CAST(mean_qual_milli AS bigint) AS mean_qual_milli,
           verdict
    FROM v
    """,
)
def q_domain_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven domain reputation: score every cited domain by the
    quality of the conversations that cite it, and emit a block/allow
    verdict — the learned counterpart of q_url_blocklist's static list
    (C4/Gopher-style domain filtering builds exactly this table before
    a crawl-scale ingest). A domain is blocked when it has real support
    (≥ {_REP_MIN_CONVS} linking conversations) AND its mean linking-conv
    quality sits below the corpus anchor; thin domains default to
    allow. Quality is the letters·1000 // chars integer rule
    (_qual_milli_sql — the milli sibling of the decile grid rule);
    the anchor and every mean are floored integers, so the verdict has
    no float edge on either engine. Shape: the shared link scan
    (_DOM_SQL) → (domain, conv) dedup agg → conv-grain equi-join to the
    quality dim → O(domains) rollup → 1-row broadcast anchor dim; the
    only corpus-grain exchanges key on conv or (domain, conv)."""
    return _reputation_df(spark, sf_dir)


@_q(
    "q_reputation_gate",
    f"""
    WITH {_TURNS_SQL},
    {_REP_SQL},
    bd AS (SELECT domain FROM v WHERE verdict = 'block'),
    hits AS (SELECT DISTINCT d.doc_id FROM d JOIN bd USING (domain)),
    c AS (SELECT dd.source, {ntok_sql('dd.text')} AS ntok,
                 (h.doc_id IS NOT NULL) AS dropped
          FROM documents dd LEFT JOIN hits h ON dd.doc_id = h.doc_id)
    SELECT source,
           CAST(COUNT(*) AS bigint) AS n_convs,
           CAST(COUNT(*) FILTER (WHERE dropped) AS bigint) AS n_dropped,
           CAST(COUNT(*) FILTER (WHERE NOT dropped) AS bigint) AS n_kept,
           CAST(COALESCE(SUM(ntok) FILTER (WHERE NOT dropped), 0)
             AS bigint) AS kept_tokens,
           CAST((COUNT(*) - COUNT(*) FILTER (WHERE dropped)) * 1000
                // COUNT(*) AS bigint) AS kept_milli
    FROM c GROUP BY source
    """,
)
def q_reputation_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enforce the learned domain blocklist: drop every conversation
    that cites a blocked domain (q_domain_reputation's verdict — the
    SAME _REP_SQL rendering, so the gate applies exactly the table the
    report publishes) and account the per-source yield. Conversations
    citing nothing are kept — no evidence, no drop. Kept tokens use
    THE corpus token unit; kept_milli is one integer division of exact
    counts. Shape: the blocked dim is O(domains) and broadcast onto the
    link rows; the hit set dedups on the conv key; one conv-grain
    left join to the conversation dim; O(sources) rollup — the gate
    adds no exchange the reputation report doesn't already run."""
    turns = _turns_df(spark, sf_dir)
    d = _domains_df(spark, sf_dir, turns)
    bd = _reputation_df(spark, sf_dir, turns).where(
        F.col("verdict") == "block"
    ).select("domain")
    hits = (
        d.join(F.broadcast(bd), "domain").select("doc_id").distinct()
    )
    docs = spread(
        load(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
    )
    c = docs.join(
        hits.withColumn("dropped", F.lit(True)), "doc_id", "left"
    ).select(
        "source",
        ntok_col("text").alias("ntok"),
        F.coalesce("dropped", F.lit(False)).alias("dropped"),
    )
    agg = c.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_convs"),
        F.count_if(F.col("dropped")).cast("long").alias("n_dropped"),
        F.count_if(~F.col("dropped")).cast("long").alias("n_kept"),
        F.coalesce(
            F.sum(F.when(~F.col("dropped"), F.col("ntok"))), F.lit(0)
        )
        .cast("long")
        .alias("kept_tokens"),
    )
    return agg.select(
        "source",
        "n_convs",
        "n_dropped",
        "n_kept",
        "kept_tokens",
        F.expr("(n_convs - n_dropped) * 1000L div n_convs")
        .cast("long")
        .alias("kept_milli"),
    )


# --------------------------------------------- context-window truncation
# SFT/RL context assembly keeps the LAST turns that fit the model's
# window; everything earlier is silently cut. This audit prices that
# cut before a training run pays it: per source, how many conversations
# fit whole, how many trailing turns survive on average, and how many
# tokens the truncation throws away. Budget in THE shared token unit.
_CTX_BUDGET = 32  # tokens of tail context the window can hold


@_q(
    "q_context_budget",
    f"""
    WITH {_TURNS_SQL},
    n AS (SELECT doc_id, t, {ntok_sql('base')} AS ntok FROM turns),
    c AS (SELECT doc_id, t, ntok,
                 SUM(ntok) OVER (PARTITION BY doc_id ORDER BY t DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum
          FROM n),
    conv AS (SELECT doc_id,
                    CAST(SUM(CASE WHEN cum <= {_CTX_BUDGET} THEN 1 ELSE 0
                             END) AS bigint) AS turns_kept,
                    CAST(SUM(CASE WHEN cum <= {_CTX_BUDGET} THEN ntok
                             ELSE 0 END) AS bigint) AS tok_kept,
                    CAST(SUM(ntok) AS bigint) AS tok_total
             FROM c GROUP BY doc_id)
    SELECT d.source,
           CAST(COUNT(*) AS bigint) AS n_convs,
           CAST(SUM(CASE WHEN conv.turns_kept = 12 THEN 1 ELSE 0 END)
                AS bigint) AS convs_full,
           CAST(SUM(conv.turns_kept) AS bigint) AS sum_turns_kept,
           CAST(SUM(conv.turns_kept) * 1000 // COUNT(*) AS bigint)
             AS mean_turns_kept_milli,
           CAST(SUM(conv.tok_total) AS bigint) AS tok_total,
           CAST(SUM(conv.tok_kept) AS bigint) AS tok_kept,
           CAST(SUM(conv.tok_total - conv.tok_kept) AS bigint)
             AS tok_dropped
    FROM conv JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
)
def q_context_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation audit: keep the suffix of each
    conversation whose running token total (counted from the LAST turn
    backwards) fits in _CTX_BUDGET — exactly the assembly rule an SFT
    loader applies — then report per source how much survives: whole
    conversations that fit, mean trailing turns kept (integer milli),
    and the token volume truncation destroys. Zero-token tail turns
    cost nothing, so they are always "kept" on both engines (cum is
    unchanged); a conversation fits whole iff all 12 turn slots fit.

    Scale: the suffix sum is a window bounded by the CONVERSATION (12
    rows per key — the bounded-window class every conv-grain operator
    here rides; never a per-source or global sort), the conv rollup is
    one doc-grain partial agg, and the source join is doc-grain
    equi-join onto the documents scan. Final exchange is O(sources).
    Token unit is THE shared corpus rule (util.ntok_sql / ntok_col)
    over the shared turn rendering (_TURNS_SQL / _turns_df)."""
    turns = _turns_df(spark, sf_dir)
    n = turns.select("doc_id", "t", ntok_col("base").alias("ntok"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = n.withColumn("cum", F.sum("ntok").over(w))
    fits = F.col("cum") <= _CTX_BUDGET
    conv = c.groupBy("doc_id").agg(
        F.sum(F.when(fits, 1).otherwise(0)).cast("long").alias(
            "turns_kept"
        ),
        F.sum(F.when(fits, F.col("ntok")).otherwise(0))
        .cast("long")
        .alias("tok_kept"),
        F.sum("ntok").cast("long").alias("tok_total"),
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        conv.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.sum(F.when(F.col("turns_kept") == 12, 1).otherwise(0))
            .cast("long")
            .alias("convs_full"),
            F.sum("turns_kept").cast("long").alias("sum_turns_kept"),
            F.sum("tok_total").cast("long").alias("tok_total"),
            F.sum("tok_kept").cast("long").alias("tok_kept"),
        )
        .select(
            "source",
            "n_convs",
            "convs_full",
            "sum_turns_kept",
            F.expr("sum_turns_kept * 1000L div n_convs")
            .cast("long")
            .alias("mean_turns_kept_milli"),
            "tok_total",
            "tok_kept",
            (F.col("tok_total") - F.col("tok_kept")).alias("tok_dropped"),
        )
    )


# ------------------------------------------- prompt/response length balance
@_q(
    "q_prompt_response_ratio",
    f"""
    WITH {_TURNS_SQL},
    pr AS (SELECT doc_id,
                  CAST(MAX(CASE WHEN t = 0 THEN {ntok_sql('base')} END)
                       AS bigint) AS p_tok,
                  CAST(MAX(CASE WHEN t = 11 THEN {ntok_sql('base')} END)
                       AS bigint) AS r_tok
           FROM turns WHERE t IN (0, 11) GROUP BY doc_id)
    SELECT d.source,
           CAST(COUNT(*) AS bigint) AS n_convs,
           CAST(SUM(pr.p_tok) AS bigint) AS prompt_tokens,
           CAST(SUM(pr.r_tok) AS bigint) AS resp_tokens,
           CAST(COUNT(*) FILTER (WHERE pr.r_tok = 0) AS bigint)
             AS n_no_response,
           CASE WHEN SUM(pr.r_tok) = 0 THEN -1
                ELSE CAST(1000 * SUM(pr.p_tok) // SUM(pr.r_tok)
                          AS bigint) END AS pr_ratio_milli
    FROM pr JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
)
def q_prompt_response_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-tuning length-balance audit: per source, opening-turn
    (prompt, t=0) vs closing-turn (response, t=11) token budgets and
    their integer-milli ratio — the skew an SFT mixture designer checks
    before paying for a source (prompt-heavy sources train parroting,
    response-empty ones train nothing; n_no_response counts the
    latter). A source whose responses total zero tokens reports the
    explicit -1 sentinel, never a division error.

    Scale: the turn explode is pruned 12→2 rows per conversation
    before the conv-grain pivot agg (the q_instruction_dedup shape);
    the source join is doc-grain equi-join; final exchange O(sources).
    Token unit is THE shared corpus rule over the shared turn
    rendering."""
    turns = _turns_df(spark, sf_dir).where(F.col("t").isin(0, 11))
    pr = turns.groupBy("doc_id").agg(
        F.max(F.when(F.col("t") == 0, ntok_col("base")))
        .cast("long")
        .alias("p_tok"),
        F.max(F.when(F.col("t") == 11, ntok_col("base")))
        .cast("long")
        .alias("r_tok"),
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        pr.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.sum("p_tok").cast("long").alias("prompt_tokens"),
            F.sum("r_tok").cast("long").alias("resp_tokens"),
            F.count_if(F.col("r_tok") == 0)
            .cast("long")
            .alias("n_no_response"),
        )
        .select(
            "source",
            "n_convs",
            "prompt_tokens",
            "resp_tokens",
            "n_no_response",
            F.when(F.col("resp_tokens") == 0, F.lit(-1).cast("long"))
            .otherwise(
                F.expr("1000 * prompt_tokens div resp_tokens").cast("long")
            )
            .alias("pr_ratio_milli"),
        )
    )


# ------------------------------------------- within-conv repeated turns
@_q(
    "q_turn_repeat_rate",
    f"""
    WITH {_TURNS_SQL},
    ne AS (SELECT doc_id, base FROM turns WHERE base <> ''),
    conv AS (SELECT doc_id,
                    CAST(COUNT(*) AS bigint) AS n_turns,
                    CAST(COUNT(DISTINCT base) AS bigint) AS n_distinct
             FROM ne GROUP BY doc_id)
    SELECT d.source,
           CAST(COUNT(*) AS bigint) AS n_convs,
           CAST(SUM(conv.n_turns) AS bigint) AS n_turns,
           CAST(SUM(conv.n_turns - conv.n_distinct) AS bigint)
             AS n_repeats,
           CAST(1000 * SUM(conv.n_turns - conv.n_distinct)
                // SUM(conv.n_turns) AS bigint) AS repeat_milli,
           CAST(COUNT(*) FILTER (WHERE conv.n_distinct < conv.n_turns)
                AS bigint) AS n_loopy_convs
    FROM conv JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
)
def q_turn_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-conversation repeated-turn rate: the GLOBAL (any-position)
    complement of q_echo_rate's adjacent-turn screen — a turn whose
    exact text already occurred ANYWHERE earlier in the conversation is
    a repeat (distinct-count set algebra, exact integers), and a
    conversation with any repeat is loopy. Catches the ping-pong loops
    (A-B-A-B) that adjacent-echo provably misses. Empty turn slots
    (conversations shorter than the 12-slot grid) are out of scope on
    both engines — repeating 'nothing' is not a loop.

    Scale: one conv-grain partial agg over the turn stream (COUNT +
    COUNT DISTINCT keyed by conversation — bounded by the ≤12-turn
    grid, never a window), doc-grain source join, O(sources) rollup."""
    turns = _turns_df(spark, sf_dir).where(F.col("base") != "")
    conv = turns.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.countDistinct("base").cast("long").alias("n_distinct"),
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        conv.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.sum("n_turns").cast("long").alias("n_turns"),
            F.sum(F.col("n_turns") - F.col("n_distinct"))
            .cast("long")
            .alias("n_repeats"),
            F.count_if(F.col("n_distinct") < F.col("n_turns"))
            .cast("long")
            .alias("n_loopy_convs"),
        )
        .select(
            "source",
            "n_convs",
            "n_turns",
            "n_repeats",
            F.expr("1000 * n_repeats div n_turns")
            .cast("long")
            .alias("repeat_milli"),
            "n_loopy_convs",
        )
    )


# ------------------------------------------- URL canonicalization dedup
# The crawl-frontier / re-crawl dedup rule: one page reachable under k
# raw spellings (tracking params, fragments, trailing slash, host case)
# must collapse to ONE canonical URL before fetch scheduling or
# dedup-by-URL accounting. The raw spellings are injected
# deterministically over the shared link scan (ONE rendering per
# engine, the _URL_TXT_SQL discipline); canonicalization is
# lowercase → strip '?query'/'#fragment' → strip trailing '/'.
# Honest boundary: production canonicalization lowercases scheme+host
# only — the synthetic URL grammar has no case-sensitive path
# segments, so whole-URL lowercasing is exact here (and identical on
# both engines), noted rather than hidden.
_RAW_URL_SQL = (
    "url"
    " || CASE WHEN (doc_id + t) % 6 = 1 THEN '/' ELSE '' END"
    " || CASE WHEN (doc_id + t) % 4 = 0 THEN"
    " '?utm_source=feed&utm_campaign=c' || CAST(doc_id % 3 AS varchar)"
    " ELSE '' END"
    " || CASE WHEN (doc_id + t) % 5 = 3 THEN '#sec-' || CAST(t AS varchar)"
    " ELSE '' END"
)


def _raw_url_col() -> F.Column:
    """Spark rendering of _RAW_URL_SQL over (doc_id, t, url); the
    upper-case variant is applied by the caller (one more coin)."""
    return F.concat(
        F.col("url"),
        F.when(
            (F.col("doc_id") + F.col("t")) % 6 == 1, F.lit("/")
        ).otherwise(F.lit("")),
        F.when(
            (F.col("doc_id") + F.col("t")) % 4 == 0,
            F.concat(
                F.lit("?utm_source=feed&utm_campaign=c"),
                (F.col("doc_id") % 3).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            (F.col("doc_id") + F.col("t")) % 5 == 3,
            F.concat(F.lit("#sec-"), F.col("t").cast("string")),
        ).otherwise(F.lit("")),
    )


@_q(
    "q_url_canonical",
    f"""
    WITH {_TURNS_SQL},
    ut AS (SELECT doc_id, t, {_URL_TXT_SQL} AS txt FROM turns),
    u AS (SELECT doc_id, t,
                 unnest(regexp_extract_all(txt, '{_URL_RE}')) AS url
          FROM ut),
    r0 AS (SELECT doc_id, t, {_RAW_URL_SQL} AS r FROM u),
    raw AS (SELECT CASE WHEN (doc_id + t) % 9 = 4 THEN upper(r) ELSE r END
                     AS raw
            FROM r0),
    c AS (SELECT raw,
                 regexp_replace(regexp_replace(lower(raw), '[?#].*$', ''),
                                '/$', '') AS canon
          FROM raw)
    SELECT regexp_extract(canon, '{_DOMAIN_RE}', 1) AS domain,
           CAST(COUNT(*) AS bigint) AS n_links,
           CAST(COUNT(DISTINCT raw) AS bigint) AS n_raw,
           CAST(COUNT(DISTINCT canon) AS bigint) AS n_canonical,
           CAST(1000 * COUNT(DISTINCT raw) // COUNT(DISTINCT canon)
                AS bigint) AS inflation_milli
    FROM c GROUP BY 1
    """,
)
def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL-spelling inflation after canonicalization:
    n_links raw link instances collapse to n_raw distinct spellings
    and n_canonical distinct canonical URLs; inflation_milli =
    1000·n_raw div n_canonical prices how much the frontier shrinks.

    Scale: URL-grain work is in-row (regexp scan bounded by links per
    turn, string decoration, two regexp_replace + lower); the single
    exchange is the domain-keyed rollup. The two DISTINCTs expand the
    rollup input ×2 (Spark Expand) — still domain-keyed partial
    aggregation, bounded by links per domain, never a corpus-constant
    key. Output is O(domains)."""
    ut = _turns_df(spark, sf_dir).select(
        "doc_id", "t", _url_txt_col().alias("txt")
    )
    u = ut.select(
        "doc_id",
        "t",
        F.explode(
            F.regexp_extract_all(F.col("txt"), F.lit(_URL_RE), F.lit(0))
        ).alias("url"),
    )
    r0 = u.select("doc_id", "t", _raw_url_col().alias("r"))
    raw = r0.select(
        F.when(
            (F.col("doc_id") + F.col("t")) % 9 == 4, F.upper("r")
        )
        .otherwise(F.col("r"))
        .alias("raw")
    )
    canon = F.regexp_replace(
        F.regexp_replace(F.lower("raw"), r"[?#].*$", ""), r"/$", ""
    )
    c = raw.select("raw", canon.alias("canon"))
    nr = F.countDistinct("raw")
    nc = F.countDistinct("canon")
    return c.groupBy(
        F.regexp_extract("canon", _DOMAIN_RE, 1).alias("domain")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        nr.cast("long").alias("n_raw"),
        nc.cast("long").alias("n_canonical"),
        F.expr(
            "1000 * count(distinct raw) div count(distinct canon)"
        ).alias("inflation_milli"),
    )


# --------------------------------------------------- refusal-rate audit
# The SFT-curation refusal screen: what fraction of assistant turns
# are canned refusals ("i cannot help with…")? Over-represented
# refusals teach a model to refuse; a per-source refusal-rate table is
# the standard pre-mix audit. Refusal turns are injected
# deterministically (ONE rendering per engine — the echo/template
# discipline: the detector must REDISCOVER the injection through the
# production regex, and the word-salad base text cannot collide with
# the phrase list).
_REFUSAL_TEMPLATES = [
    "i cannot help with that request. ",
    "i am sorry, but i cannot assist with this. ",
    "as an ai language model i cannot do that. ",
]
_REFUSAL_RE = (
    "^(i cannot help|i am sorry, but i cannot|as an ai language model)"
)
_REFUSAL_ARR_SQL = (
    "['" + "','".join(_REFUSAL_TEMPLATES) + "']"
)
_REFUSAL_HIGH_MILLI = 100


@_q(
    "q_refusal_rate",
    f"""
    WITH tk AS (SELECT doc_id, source, string_split(text, ' ') AS tk
                FROM documents),
    turns AS (
      SELECT doc_id, source, g.t, {_TURN_BASE_SQL} AS base
      FROM tk, unnest(generate_series(0, 11)) g(t)
      WHERE g.t % 3 = 1
    ),
    dec AS (
      SELECT doc_id, source,
             CASE WHEN (doc_id * 5 + t) % 13 = 3 THEN
               {_REFUSAL_ARR_SQL}[(doc_id % 3) + 1] || base
             ELSE base END AS txt
      FROM turns
    ),
    f AS (SELECT doc_id, source,
                 CASE WHEN regexp_matches(txt, '{_REFUSAL_RE}')
                      THEN 1 ELSE 0 END AS hit
          FROM dec)
    SELECT source,
           CAST(COUNT(*) AS bigint) AS n_asst_turns,
           CAST(SUM(hit) AS bigint) AS n_refusals,
           CAST(1000 * SUM(hit) // COUNT(*) AS bigint) AS refusal_milli,
           CAST(COUNT(DISTINCT CASE WHEN hit = 1 THEN doc_id END)
                AS bigint) AS n_affected_convs,
           1000 * SUM(hit) // COUNT(*) > {_REFUSAL_HIGH_MILLI}
             AS high_refusal
    FROM f GROUP BY source
    """,
)
def q_refusal_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source assistant refusal rate (integer milli) with the
    affected-conversation count and the >{_REFUSAL_HIGH_MILLI}‰
    high_refusal verdict — the screen that catches a source whose
    assistant side is dominated by canned refusals before it poisons
    an SFT mix.

    Scale: assistant turns explode in-row (4 per conversation after
    the t%3 prune), the regex runs per turn, and the only exchange is
    the O(sources) rollup (the DISTINCT doc_id count is source-keyed
    partial aggregation). Output is O(sources)."""
    docs = spread(
        load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    t = docs.select(
        "doc_id",
        "source",
        F.split("text", " ").alias("tk"),
        F.explode(F.sequence(F.lit(0), F.lit(11))).alias("t"),
    ).where(F.col("t") % 3 == 1)
    base = _turn_base_col(F.col("tk"), F.col("t"))
    tmpl = F.array(
        *[F.lit(s) for s in _REFUSAL_TEMPLATES]
    )[(F.col("doc_id") % 3).cast("int")]
    txt = F.when(
        (F.col("doc_id") * 5 + F.col("t")) % 13 == 3,
        F.concat(tmpl, base),
    ).otherwise(base)
    f = t.select(
        "doc_id",
        "source",
        F.when(txt.rlike(_REFUSAL_RE), 1).otherwise(0).alias("hit"),
    )
    return f.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_asst_turns"),
        F.sum("hit").cast("long").alias("n_refusals"),
        F.expr("1000 * sum(hit) div count(1)").alias("refusal_milli"),
        F.countDistinct(F.when(F.col("hit") == 1, F.col("doc_id")))
        .cast("long")
        .alias("n_affected_convs"),
        (
            F.expr("1000 * sum(hit) div count(1)") > _REFUSAL_HIGH_MILLI
        ).alias("high_refusal"),
    )


# ------------------------------------------------ FD-strength audit
# Schema archaeology for a corpus nobody documented: does `source`
# functionally determine `lang`? Per determinant value: the row
# count, the distinct dependent count, the majority dependent (ties
# broken lexicographically — deterministic across engines), and the
# FD strength as exact integer milli (1000·majority_n div n — the
# complement of Kivinen-Mannila g3 error, 1000 = the FD holds
# exactly). A source at 1000 is safe to treat as monolingual
# downstream; anything below is the violation list a data contract
# review reads. Scale: the (source, lang) rollup is the only corpus
# exchange (map-side combined); the majority election is the house
# rank window on that O(sources × langs) dim, never documents.
@_q(
    "q_fd_audit",
    """
    WITH c AS (SELECT source, lang, CAST(COUNT(*) AS bigint) AS n
               FROM documents GROUP BY 1, 2),
    r AS (SELECT source, lang, n,
                 SUM(n) OVER (PARTITION BY source) AS n_docs,
                 COUNT(*) OVER (PARTITION BY source) AS n_langs,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY n DESC, lang) AS rk
          FROM c)
    SELECT source,
           CAST(n_docs AS bigint) AS n_docs,
           CAST(n_langs AS bigint) AS n_langs,
           lang AS top_lang,
           n AS top_n,
           CAST(1000 * n // n_docs AS bigint) AS fd_milli
    FROM r WHERE rk = 1
    """,
)
def q_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source: how strongly source→lang holds (exact milli g3
    complement), with the majority language and distinct-lang count.
    See family comment — dim windows only."""
    c = (
        load(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wsrc = Window.partitionBy("source")
    wrk = Window.partitionBy("source").orderBy(
        F.desc("n"), F.asc("lang")
    )
    r = c.select(
        "source",
        "lang",
        "n",
        F.sum("n").over(wsrc).alias("n_docs"),
        F.count(F.lit(1)).over(wsrc).alias("n_langs"),
        F.row_number().over(wrk).alias("rk"),
    )
    return r.where(F.col("rk") == 1).select(
        "source",
        F.col("n_docs").cast("long"),
        F.col("n_langs").cast("long"),
        F.col("lang").alias("top_lang"),
        F.col("n").alias("top_n"),
        F.expr("cast(1000 * n div n_docs as bigint)").alias("fd_milli"),
    )
