"""Release-governance rollup: the one table a corpus release decision
reads, composed FROM the registered per-source reports — not
re-derived. The Spark side calls the production builders
(q_dataset_card, q_k_anonymity, q_robust_stats, q_source_kl) and the
oracle interpolates those queries' OWN registered SQL as subqueries, so
the audit is definitionally consistent with every standalone report: a
drift in any component would break this gate before it could mislead a
release reviewer (the q_neardup_agreement maximal-reuse discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpusops import ORACLES as _CO_ORACLES
from .corpusops import q_dataset_card
from .relevance import ORACLES as _RV_ORACLES
from .relevance import q_robust_stats, q_source_kl
from .textstats import ORACLES as _TS_ORACLES
from .textstats import q_k_anonymity

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, sql: str | None = None):
    def reg(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return reg


# blocker thresholds — each check reads a PUBLISHED column of a
# registered report, so the release verdict can never disagree with
# the standalone reports a reviewer would drill into
_REL_DUP_MILLI = 100  # duplicated-doc share
_REL_OUT_MILLI = 50  # MAD-outlier share
_REL_KL = 0.1  # unigram drift from the corpus marginal

# FAIL CLOSED on a missing component row: the audit anchors on the
# dataset card (it covers every source) and LEFT-joins the other
# reports, and a check whose input is absent COUNTS AS A BLOCKER —
# an all-empty source has no q_source_kl row and must surface as a
# blocked row in the one table a reviewer reads, never silently
# vanish from it.
_BLOCKERS_SQL = (
    f"CAST(NOT COALESCE(k_anonymous, FALSE) AS int)"
    f" + CAST(dup_milli > {_REL_DUP_MILLI} AS int)"
    f" + CAST(COALESCE(outlier_milli > {_REL_OUT_MILLI}, TRUE) AS int)"
    f" + CAST(COALESCE(kl > {_REL_KL}, TRUE) AS int)"
    f" + CAST(n_empty > 0 AS int)"
)


@_q(
    "q_release_audit",
    f"""
    SELECT c.source, c.n_docs, c.tok_total, c.dup_milli, c.n_empty,
           k.k_anonymous, k.risk_milli, r.med, r.mad, r.outlier_milli,
           s.kl,
           CAST({_BLOCKERS_SQL} AS int) AS n_blockers,
           {_BLOCKERS_SQL} = 0 AS release_ok
    FROM ({_CO_ORACLES["q_dataset_card"]}) c
    LEFT JOIN ({_TS_ORACLES["q_k_anonymity"]}) k USING (source)
    LEFT JOIN ({_RV_ORACLES["q_robust_stats"]}) r USING (source)
    LEFT JOIN ({_RV_ORACLES["q_source_kl"]}) s USING (source)
    """,
)
def q_release_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source release-readiness: the dataset-card volume/dup
    columns, the k-anonymity verdict, the robust-length outlier rate
    and the unigram KL drift side by side, an exact integer blocker
    count over five published checks (privacy, duplication, outliers,
    drift, empty docs), and release_ok = zero blockers. Row set is
    EXACTLY the dataset card's (the anchor covers every source); a
    source missing from a component report — e.g. all-empty docs have
    no KL row — keeps its audit row with that check counted as a
    blocker (fail closed), never a silent drop.

    Scale: each component keeps its own audited plan (this op adds
    only O(sources) joins of the four per-source dims); maximal reuse
    — the builders ARE the registered queries, the oracle interpolates
    their registered SQL."""
    c = q_dataset_card(spark, sf_dir).select(
        "source", "n_docs", "tok_total", "dup_milli", "n_empty"
    )
    k = q_k_anonymity(spark, sf_dir).select(
        "source", "k_anonymous", "risk_milli"
    )
    r = q_robust_stats(spark, sf_dir).select(
        "source", "med", "mad", "outlier_milli"
    )
    s = q_source_kl(spark, sf_dir).select("source", "kl")
    j = (
        c.join(F.broadcast(k), "source", "left")
        .join(F.broadcast(r), "source", "left")
        .join(F.broadcast(s), "source", "left")
    )
    return j.select(
        "source",
        "n_docs",
        "tok_total",
        "dup_milli",
        "n_empty",
        "k_anonymous",
        "risk_milli",
        "med",
        "mad",
        "outlier_milli",
        "kl",
        F.expr(f"cast({_BLOCKERS_SQL} as int)").alias("n_blockers"),
        F.expr(f"{_BLOCKERS_SQL} = 0").alias("release_ok"),
    )
