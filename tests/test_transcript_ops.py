"""Transcript-stream operators: invariants beyond the DuckDB value gate
for turn supersession (latest-wins upsert) and tool retry-run islands."""

import pyspark.sql.functions as F

from documentai_ocr_spark.queries.relational import (
    _RETRY_DELAY_MS,
    q_tool_retry_runs,
    q_turn_supersede,
)
from documentai_ocr_spark.synth import transcripts_from_documents

SF = "/root/testdata/sf0.001"


def test_supersede_one_row_per_turn_key(spark):
    """Resolution must emit EXACTLY one surviving attempt per
    (conv_id, turn_idx) — the upsert contract. 12 turns per conv."""
    out = q_turn_supersede(spark, SF).cache()
    n_convs = transcripts_from_documents(spark, SF).select(
        "conv_id"
    ).distinct().count()
    assert out.count() == n_convs * 12
    dup = (
        out.groupBy("conv_id", "turn_idx")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    out.unpersist()


def test_supersede_retries_win_by_exact_delay(spark):
    """Every 2-attempt turn's kept_ms is the retry's timestamp — the
    base ts plus exactly the retry delay; 1-attempt turns keep the
    original. Cross-checked against the raw transcripts table."""
    out = q_turn_supersede(spark, SF)
    base = transcripts_from_documents(spark, SF).select(
        "conv_id",
        "turn_idx",
        F.unix_millis("ts").alias("base_ms"),
        F.col("role").alias("base_role"),
    )
    j = out.join(base, ["conv_id", "turn_idx"]).cache()
    assert j.where(~F.col("n_attempts").isin(1, 2)).count() == 0
    bad_retry = j.where(
        (F.col("n_attempts") == 2)
        & (F.col("kept_ms") != F.col("base_ms") + _RETRY_DELAY_MS)
    ).count()
    bad_orig = j.where(
        (F.col("n_attempts") == 1) & (F.col("kept_ms") != F.col("base_ms"))
    ).count()
    bad_role = j.where(F.col("role") != F.col("base_role")).count()
    assert (bad_retry, bad_orig, bad_role) == (0, 0, 0)
    j.unpersist()


def test_retry_runs_partition_tool_turns(spark):
    """Run lengths histogram must partition the tool-turn count exactly:
    sum(run_len * n_runs) == total tool turns, and no run can exceed a
    conversation's 4 tool slots."""
    out = q_tool_retry_runs(spark, SF).cache()
    total = out.select(
        F.sum(F.col("run_len") * F.col("n_runs")).cast("long")
    ).first()[0]
    n_tool_turns = (
        transcripts_from_documents(spark, SF)
        .where(F.col("role") == "tool")
        .count()
    )
    assert total == n_tool_turns
    assert out.where((F.col("run_len") < 1) | (F.col("run_len") > 4)).count() == 0
    # the histogram must actually contain a retry (run_len >= 2) —
    # otherwise the gate is comparing a degenerate all-ones table
    assert out.where(F.col("run_len") >= 2).count() > 0
    out.unpersist()
