"""Batched model-inference hook — the per-executor singleton pattern.

The reference's dominant runtime cost is model calls amortized by
batching: a PaddleOCR/easyocr instance constructed once per process and
fed batches (/root/reference/ocrclient/pdocr.py:9-32, rechanimage.py:
96-135), and a DataLoader with batch_size=256 feeding the slice
classifier (/root/reference/mocov1/app.py:59-67). This module is that
hook on Spark:

  * weights travel as a BROADCAST variable (one copy per executor, not
    per task);
  * the model object is a LAZY PER-WORKER-PROCESS SINGLETON (module-level
    cache keyed by broadcast id — Python workers are reused across tasks,
    so a worker initializes once per model version, verified by test);
  * inference runs on DataLoader-sized micro-batches inside each Arrow
    batch (BATCH_SIZE=256 like the reference), never per row.

The bundled model is DELIBERATELY a deterministic linear scorer over
text statistics (the survey-sanctioned replacement for the MoCo slice
classifier — rules stay reproducible, no GPU): swap ``RuleModel`` for a
real framework model and nothing else changes. Because the scorer is
deterministic arithmetic, q_model_classify cross-checks the whole hook
against a DuckDB SQL oracle — batch plumbing included.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

BATCH_SIZE = 256  # the reference DataLoader's batch size (mocov1/app.py:59-67)
LABEL_TAU = 0.5

# weights over [bias, len_capped, alnum_ratio, digit_ratio, space_ratio]
DEFAULT_WEIGHTS = (0.1, 0.3, 0.5, -0.2, 0.1)

# per-Python-worker-process singletons, keyed by the broadcast VALUE (the
# weights tuple = model version). NOT by the Broadcast handle: worker-side
# Broadcast objects expose no stable id, and each batch_classify call
# creates a new broadcast — keying by handle would re-init every job.
_MODEL_CACHE: dict = {}
_INIT_SEQ = 0  # per-process init-event counter (test observability)


class RuleModel:
    """Deterministic linear scorer. ``predict`` consumes a micro-batch of
    texts and returns scores; the term-by-term accumulation order is
    fixed (f0→f4) so the DuckDB oracle reproduces the doubles exactly."""

    def __init__(self, weights):
        self.w = [float(v) for v in weights]
        self.n_calls = 0

    def predict(self, texts: pd.Series) -> np.ndarray:
        self.n_calls += 1
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.array(texts.fillna(""), type=pa.string())
        n = pc.utf8_length(arr).to_numpy().astype(np.float64)
        nz = np.maximum(n, 1.0)

        def ratio(pattern):
            cnt = (
                pc.count_substring_regex(arr, pattern)
                .to_numpy()
                .astype(np.float64)
            )
            return np.where(n > 0, cnt / nz, 0.0)

        f1 = np.minimum(n, 1000.0) / 1000.0
        f2 = ratio("[0-9A-Za-z一-龥]")
        f3 = ratio("[0-9]")
        f4 = ratio(" ")
        w = self.w
        score = w[0] * np.ones_like(n)
        score = score + w[1] * f1
        score = score + w[2] * f2
        score = score + w[3] * f3
        score = score + w[4] * f4
        return score


_BC_CACHE: dict = {}


def _get_broadcast(spark, weights: tuple):
    """Driver-side twin of the worker model cache: ONE broadcast per
    (SparkContext, weights tuple) instead of a fresh broadcast per
    batch_classify call — a scoring loop over many DataFrames would
    otherwise accumulate never-destroyed broadcast blocks for the
    session's lifetime. Keyed by applicationId so a stopped/restarted
    context never serves a stale broadcast."""
    sc = spark.sparkContext
    key = (sc.applicationId, weights)
    bc = _BC_CACHE.get(key)
    if bc is None:
        bc = sc.broadcast(weights)
        _BC_CACHE[key] = bc
    return bc


def _get_model(bc, marker_dir: str | None):
    """Lazy per-process singleton: one RuleModel per (worker process,
    model version) where the version IS the weights tuple — same weights,
    same model, even across jobs on a reused worker. ``marker_dir``
    (tests) records each REAL init so the one-init-per-worker property is
    observable from the driver."""
    key = bc.value  # hashable weights tuple = the model version
    model = _MODEL_CACHE.get(key)
    if model is None:
        model = RuleModel(bc.value)
        _MODEL_CACHE[key] = model
        if marker_dir:
            # unique file PER INIT EVENT (monotonic per-process seq), not
            # per (pid, key): a broken singleton that re-inits would
            # otherwise overwrite the same marker and hide from the test
            global _INIT_SEQ
            _INIT_SEQ += 1
            open(
                os.path.join(
                    marker_dir, f"init-{os.getpid()}-{_INIT_SEQ}"
                ),
                "w",
            ).close()
    return model


def batch_classify(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights=DEFAULT_WEIGHTS,
    batch_size: int = BATCH_SIZE,
    marker_dir: str | None = None,
) -> DataFrame:
    """Score every row with the per-executor model singleton, feeding it
    DataLoader-sized micro-batches. Output: (id, score, label)."""
    spark = df.sparkSession
    bc = _get_broadcast(spark, tuple(float(v) for v in weights))
    src = df.select(df[id_col].alias("id"), df[text_col].alias("text"))
    id_type = src.schema["id"].dataType.simpleString()
    schema = f"{id_col} {id_type}, score double, label int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _get_model(bc, marker_dir)
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            parts = []
            for lo in range(0, n, batch_size):
                chunk = pdf["text"].iloc[lo : lo + batch_size]
                scores = model.predict(chunk.reset_index(drop=True))
                if marker_dir:
                    open(
                        os.path.join(
                            marker_dir,
                            f"call-{os.getpid()}-{model.n_calls}-{len(chunk)}",
                        ),
                        "w",
                    ).close()
                parts.append(scores)
            score = np.concatenate(parts)
            yield pd.DataFrame(
                {
                    id_col: pdf["id"].to_numpy(),
                    "score": score,
                    "label": (score >= LABEL_TAU).astype(np.int32),
                }
            )

    return src.mapInPandas(run, schema=schema)
