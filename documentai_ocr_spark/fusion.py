"""Turn-level multi-engine extraction fusion — the reference's pipeline
§3.3 (incremental multi-engine fusion, SURVEY.md) at the transcript
level.

The reference runs N OCR engines per image, then fuses: per (image,
candidate_text) sum the engines' weighted scores, keep the argmax above
a floor (/root/reference/ocrclient/redisdata.py:59-64,253-262,295-322).
Here the "engines" are four plain-path recognizers — the three
rules.RULE_VARIANTS operating points (production / strict /
lenient-rescue) plus the hysteresis decoder — and the unit is the turn:

  1. one ``mapInPandas`` pass emits one candidate row per (turn, engine)
     — the kernel runs once per variant per Arrow batch, all vectorized;
  2. fusion is pure relational: candidates ⋈ broadcast weight table →
     groupBy (turn, text) sum(weight·score) → floor → argmax window.

Candidates with empty extracted text are dropped (the reference's
text_len filter, redisdata.py:113). Scoring: a candidate's score is the
mean of its span scores (round 6), exactly as the oracle computes it.

Scale: stage 1 is narrow ×4 work; stage 2 shuffles one row per
(turn, distinct candidate) — ≤4 rows per turn (the weight join keeps
only the 3 weighted engines for fusion; the vote consumes all 4).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .extract.core import classify_payload_batch
from .extract.textops import (
    extract_plain_batch,
    extract_plain_hysteresis_batch,
    pin_arrow_pools,
)
from .rules import (
    FUSION_SCORE_FLOOR,
    FUSION_WEIGHTS,
    PAYLOAD_PLAIN,
    RULE_VARIANTS,
)

CANDIDATE_SCHEMA = (
    "conv_id string, turn_idx int, engine string, cand_text string, "
    "cand_score double"
)


def _candidate_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """One Arrow batch → candidate rows (turn × engine). Only plain
    payloads participate in multi-engine fusion (the variants are
    line-rule operating points); other payload kinds are skipped here."""
    texts = pdf["text"].reset_index(drop=True)
    kinds = classify_payload_batch(texts)
    mask = (kinds == PAYLOAD_PLAIN).to_numpy()
    out_frames = []
    sub = texts[mask].reset_index(drop=True)
    conv = pdf["conv_id"].to_numpy()[mask]
    tidx = pdf["turn_idx"].to_numpy()[mask]
    if len(sub):
        # the fusion engines (RULE_VARIANTS operating points) plus the
        # hysteresis decoder as a 4th independent recognizer — fusion's
        # inner join against FUSION_WEIGHTS ignores it; the ×4 vote
        # (extract_vote) requires all four to agree
        engines = [
            (eng, lambda s, ml=ml, d=d: extract_plain_batch(s, ml, d))
            for eng, (ml, d) in RULE_VARIANTS.items()
        ] + [("hysteresis", extract_plain_hysteresis_batch)]
        for engine, kernel in engines:
            res = kernel(sub)
            # candidate score = mean of span scores, computed from the
            # kernel's vectorized LEFT-FOLD score_sum (same accumulation
            # order as the oracle's sum()/len — np.mean's pairwise
            # summation can differ in the last ulp and flip the argmax).
            # np.round matches the oracle's round6 spec bit-for-bit —
            # pinned (incl. exact decimal midpoints) by
            # tests/test_fusion.py::test_np_round_matches_round6.
            cnt = res["n_spans"].to_numpy()
            ssum = res["score_sum"].to_numpy()
            safe = np.where(cnt == 0, 1, cnt)
            score = np.where(cnt == 0, 0.0, np.round(ssum / safe, 6))
            keep = res["text"].to_numpy() != ""
            out_frames.append(
                pd.DataFrame(
                    {
                        "conv_id": conv[keep],
                        "turn_idx": tidx[keep],
                        "engine": engine,
                        "cand_text": res["text"].to_numpy()[keep],
                        "cand_score": score[keep],
                    }
                )
            )
    if not out_frames:
        return pd.DataFrame(
            {
                "conv_id": pd.array([], dtype=object),
                "turn_idx": pd.array([], dtype="int32"),
                "engine": pd.array([], dtype=object),
                "cand_text": pd.array([], dtype=object),
                "cand_score": pd.array([], dtype="float64"),
            }
        )
    res = pd.concat(out_frames, ignore_index=True)
    res["turn_idx"] = res["turn_idx"].astype("int32")
    return res


def extract_candidates(transcripts: DataFrame) -> DataFrame:
    """Stage 1: per-(turn, engine) extraction candidates (narrow)."""
    src = transcripts.select("conv_id", "turn_idx", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pin_arrow_pools()
        for pdf in batches:
            if len(pdf):
                yield _candidate_batch(pdf)

    return src.mapInPandas(run, schema=CANDIDATE_SCHEMA)


def fuse_candidates(cands: DataFrame) -> DataFrame:
    """Stage 2: weighted fusion + per-turn argmax with score floor."""
    spark = cands.sparkSession
    wt = spark.createDataFrame(
        list(FUSION_WEIGHTS.items()), "engine string, weight double"
    )
    # no rounding on the fused sum: Spark round is HALF_UP, Python round
    # is HALF_EVEN, and per-engine scores are rationals that land on
    # midpoints; raw doubles agree to ~1e-15 across engines instead
    fused = (
        cands.join(F.broadcast(wt), "engine")
        .groupBy("conv_id", "turn_idx", "cand_text")
        .agg(
            F.sum(F.col("cand_score") * F.col("weight")).alias("fused_score")
        )
        .where(F.col("fused_score") >= FUSION_SCORE_FLOOR)
    )
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.desc("fused_score"), F.asc("cand_text")
    )
    return (
        fused.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "conv_id",
            "turn_idx",
            F.col("cand_text").alias("best_text"),
            "fused_score",
        )
    )


def extract_fused(transcripts: DataFrame) -> DataFrame:
    """The full fusion pipeline (reference lifecycle §3.3)."""
    return fuse_candidates(extract_candidates(transcripts))


VOTE_TIMES = 4  # the reference tiles ×4 and requires 4 identical results


def extract_vote(transcripts: DataFrame) -> DataFrame:
    """×4 self-consistency vote (/root/reference/font/rec.py:41-87: OCR a
    4×-tiled image, accept iff it reads as 4 identical chars): run the
    four plain-path recognizers (3 rule operating points + hysteresis)
    per turn and keep only turns where ALL produce the same non-empty
    text — a correctness-by-agreement data-quality filter. A recognizer
    returning empty text counts as disagreement (the reference's
    len(text) != TIMES rejection). Relational core: unanimity as
    ``min(text) == max(text)`` — a single-pass aggregate (ONE shuffle of
    ≤4 rows per turn, plan-asserted), where countDistinct would force a
    two-phase expand+reshuffle."""
    cands = extract_candidates(transcripts)
    return (
        cands.groupBy("conv_id", "turn_idx")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cand_text").alias("tmin"),
            F.max("cand_text").alias("tmax"),
        )
        .where((F.col("n") == VOTE_TIMES) & (F.col("tmin") == F.col("tmax")))
        .select("conv_id", "turn_idx", F.col("tmin").alias("text"))
    )
