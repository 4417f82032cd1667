"""The reference's label-spec mini-DSL as a pure-Catalyst operator.

Semantics re-derived from /root/reference/mocov1/cls/pdpd/datapreprocess.py:20-94
(a 75-LoC two-stack state machine) and re-expressed as ONE anchored regex
plus ``sequence()`` — no UDF, fully pushdown-friendly, and identically
executable by DuckDB:

    '35'      → [35]
    '35*'     → [35], important
    '35-40'   → [35..40]
    '35+3'    → [35..38]          (start, start+count)
    '35++'    → [35..37]          (k plusses → k extra indices)
    anything else → malformed, dropped (the reference raises; the engine
    applies its own DROPMALFORMED discipline, spiltTools.py:21-22)

'*' is only valid as a suffix (the reference's stack pops stars first and
then asserts the remainder — mid-string stars fail its asserts too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import load

QUERIES: dict = {}
ORACLES: dict = {}

_PAT = r"^(\d+)(?:-(\d+)|\+(\d+)|(\++))?(\**)$"


def label_spec_indices(df: DataFrame, col: str = "spec") -> DataFrame:
    """(…, spec) → (…, idx int, important boolean), malformed rows
    dropped. Pure column expressions: rlike gate → regexp captures →
    sequence explode."""
    g = lambda i: F.regexp_extract(F.col(col), _PAT, i)  # noqa: E731
    a = g(1).cast("int")
    end = (
        F.when(g(2) != "", g(2).cast("int"))
        .when(g(3) != "", a + g(3).cast("int"))
        .when(g(4) != "", a + F.length(g(4)))
        .otherwise(a)
    )
    # reversed ranges ('40-35') yield ZERO rows: Spark sequence() would
    # descend when end < a, but DuckDB generate_series and the reference
    # state machine both produce nothing — guard to the common semantics
    seq = F.when(end >= a, F.sequence(a, end)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        df.where(F.col(col).rlike(_PAT))
        .withColumn("important", F.length(g(5)) > 0)
        .withColumn("idx", F.explode(seq))
    )


_SPEC_SQL = """
    SELECT doc_id,
           CASE doc_id % 6
             WHEN 0 THEN CAST(doc_id % 90 + 10 AS varchar)
             WHEN 1 THEN CAST(doc_id % 90 + 10 AS varchar) || '*'
             WHEN 2 THEN CAST(doc_id % 90 + 10 AS varchar) || '-'
                         || CAST(doc_id % 90 + 13 + doc_id % 7
                                 - (CASE WHEN doc_id % 5 = 0 THEN 25 ELSE 0 END)
                                 AS varchar)
             WHEN 3 THEN CAST(doc_id % 90 + 10 AS varchar) || '+'
                         || CAST(doc_id % 5 AS varchar)
             WHEN 4 THEN CAST(doc_id % 90 + 10 AS varchar) || '++'
             ELSE 'x' || CAST(doc_id % 90 + 10 AS varchar)
           END AS spec
    FROM documents
"""


def _spec_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic spec strings derived from doc_id (same expression as
    _SPEC_SQL; doc_id % 6 == 5 rows are intentionally malformed)."""
    base = F.col("doc_id") % 90 + 10
    m = F.col("doc_id") % 6
    spec = (
        F.when(m == 0, base.cast("string"))
        .when(m == 1, F.concat(base.cast("string"), F.lit("*")))
        .when(
            m == 2,
            # doc_id % 5 == 0 rows get a REVERSED (or negative → malformed)
            # range end, exercising the empty-sequence guard in the gate
            F.concat(
                base.cast("string"),
                F.lit("-"),
                (
                    base
                    + 3
                    + F.col("doc_id") % 7
                    - F.when(F.col("doc_id") % 5 == 0, 25).otherwise(0)
                ).cast("string"),
            ),
        )
        .when(
            m == 3,
            F.concat(
                base.cast("string"),
                F.lit("+"),
                (F.col("doc_id") % 5).cast("string"),
            ),
        )
        .when(m == 4, F.concat(base.cast("string"), F.lit("++")))
        .otherwise(F.concat(F.lit("x"), base.cast("string")))
    )
    return load(spark, sf_dir, "documents").select("doc_id", spec.alias("spec"))


def q_label_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_spec_indices(_spec_df(spark, sf_dir)).select(
        "doc_id", "spec", F.col("idx").cast("int").alias("idx"), "important"
    )


QUERIES["q_label_dsl"] = q_label_dsl
ORACLES["q_label_dsl"] = f"""
    WITH specs AS ({_SPEC_SQL}),
    parsed AS (
      SELECT doc_id, spec,
             CAST(regexp_extract(spec, '{_PAT}', 1) AS int) AS a,
             regexp_extract(spec, '{_PAT}', 2) AS g2,
             regexp_extract(spec, '{_PAT}', 3) AS g3,
             regexp_extract(spec, '{_PAT}', 4) AS g4,
             regexp_extract(spec, '{_PAT}', 5) AS g5
      FROM specs WHERE regexp_matches(spec, '{_PAT}')
    )
    SELECT doc_id, spec, CAST(u.idx AS int) AS idx,
           length(g5) > 0 AS important
    FROM parsed,
         unnest(generate_series(a,
            CASE WHEN g2 <> '' THEN CAST(g2 AS int)
                 WHEN g3 <> '' THEN a + CAST(g3 AS int)
                 WHEN g4 <> '' THEN a + length(g4)
                 ELSE a END)) AS u(idx)
"""
