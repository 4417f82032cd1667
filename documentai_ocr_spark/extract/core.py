"""The extraction operator: transcripts DataFrame → extracted DataFrame.

Spark-first design: the whole extraction is ONE narrow ``mapInPandas``
stage over the scan — no shuffle at all for the per-turn path (each
turn's extraction is independent; the per-turn text-equality contract
makes this embarrassingly parallel, which is exactly why it scales to
10^12 turns: throughput is scan-bound, parallelism is the partition
count, and there is no key to skew).

Cross-turn operations (conversation assembly) DO need grouping and
ordering — they live in :func:`assemble_conversations`, which uses an
order-preserving two-phase (salted) aggregation so a single monster
conversation cannot straggle one reducer (BASELINE.json north_rule skew
requirement).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..rules import (
    HTML_SNIFF_RE,
    PAYLOAD_HTML,
    PAYLOAD_PDFISH,
    PAYLOAD_PLAIN,
    PDFISH_SNIFF_RE,
)
from .textops import (
    extract_html_batch,
    extract_pdfish_batch,
    extract_plain_batch,
    extract_plain_hysteresis_batch,
    word_spans_batch,
)

# selectable plain-path kernels: the single-threshold density rule
# (production default) and the two-threshold hysteresis decoder
# (reference characterSegment.py semantics — survives brief dips)
PLAIN_VARIANTS = {
    "density": extract_plain_batch,
    "hysteresis": extract_plain_hysteresis_batch,
}

# spans index the EXTRACTED text; beg/end are char offsets, end exclusive
SPANS_TYPE = "array<struct<beg:int,end:int,kind:string,score:double>>"
EXTRACT_SCHEMA = (
    "conv_id string, turn_idx int, role string, payload_kind string, "
    f"text string, spans {SPANS_TYPE}, n_spans int"
)


def classify_payload_batch(texts: pd.Series) -> pd.Series:
    """Vectorized payload sniffing for a whole Arrow batch (RE2 scans on
    contiguous buffers)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(texts.fillna(""), type=pa.string())
    is_pdfish = pc.match_substring_regex(arr, PDFISH_SNIFF_RE.pattern).to_numpy(
        zero_copy_only=False
    )
    is_html = (
        pc.match_substring_regex(arr, HTML_SNIFF_RE.pattern).to_numpy(
            zero_copy_only=False
        )
        & pc.match_substring(arr, "</").to_numpy(zero_copy_only=False)
        & ~is_pdfish
    )
    out = np.full(len(arr), PAYLOAD_PLAIN, dtype=object)
    out[is_pdfish] = PAYLOAD_PDFISH
    out[is_html] = PAYLOAD_HTML
    return pd.Series(out, index=texts.index)


def _extract_arrays(texts: pd.Series, plain_variant: str):
    """The ONE extraction kernel core, shared by both Python boundaries
    (:func:`extract_batch` for mapInPandas, :func:`extract_turns_arrow`
    for mapInArrow): a text Series in, plain output arrays out —
    (kinds Series, text object-array, spans object-array, n_spans
    int64-array), all batch-ordered."""
    kinds = classify_payload_batch(texts)

    n = len(texts)
    # plain numpy arrays, NOT views into a DataFrame: Series.to_numpy()
    # under pandas Copy-on-Write returns read-only/copied buffers, so
    # writing through it would either raise or silently lose the spans
    text_out = np.full(n, "", dtype=object)
    spans_out = np.empty(n, dtype=object)
    spans_out[:] = [[] for _ in range(n)]
    n_spans_out = np.zeros(n, dtype=np.int64)
    for kind, fn in (
        (PAYLOAD_PLAIN, PLAIN_VARIANTS[plain_variant]),
        (PAYLOAD_HTML, extract_html_batch),
        (PAYLOAD_PDFISH, extract_pdfish_batch),
    ):
        mask = (kinds == kind).to_numpy()
        if not mask.any():
            continue
        sub = fn(texts[mask].reset_index(drop=True))
        pos = np.flatnonzero(mask)
        text_out[pos] = sub["text"].to_numpy()
        spans_out[pos] = sub["spans"].to_numpy()
        n_spans_out[pos] = sub["n_spans"].to_numpy()
    return kinds, text_out, spans_out, n_spans_out


def extract_batch(pdf: pd.DataFrame, plain_variant: str = "density") -> pd.DataFrame:
    """One Arrow batch of transcript turns → extracted rows (same order)."""
    texts = pdf["text"].reset_index(drop=True)
    kinds, text_out, spans_out, n_spans_out = _extract_arrays(
        texts, plain_variant
    )
    return pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].to_numpy(),
            "turn_idx": pdf["turn_idx"].to_numpy(),
            "role": pdf["role"].to_numpy(),
            "payload_kind": kinds.to_numpy(),
            "text": text_out,
            "spans": spans_out,
            "n_spans": n_spans_out,
        }
    )


def extract_turns(
    transcripts: DataFrame, plain_variant: str = "density"
) -> DataFrame:
    """Per-turn main-content extraction. Narrow (no shuffle): the plan is
    scan → WholeStageCodegen(project) → ArrowEvalPython → output, so it
    scales linearly with input partitions (tune
    ``spark.sql.files.maxPartitionBytes`` for split granularity and
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` for batch shape).
    ``plain_variant`` selects the plain-payload kernel (PLAIN_VARIANTS).
    """
    if plain_variant not in PLAIN_VARIANTS:
        raise ValueError(f"unknown plain_variant {plain_variant!r}")
    # prune to the columns the kernel needs — keeps the parquet ReadSchema
    # minimal even though mapInPandas is a black box to Catalyst
    src = transcripts.select("conv_id", "turn_idx", "role", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .textops import pin_arrow_pools

        pin_arrow_pools()  # 1 arrow thread per worker process
        for pdf in batches:
            if len(pdf):
                yield extract_batch(pdf, plain_variant)

    return src.mapInPandas(run, schema=EXTRACT_SCHEMA)


def extract_turns_arrow(
    transcripts: DataFrame, plain_variant: str = "density"
) -> DataFrame:
    """``mapInArrow`` twin of :func:`extract_turns`: identical kernel,
    identical output (byte-equal — pinned by tests/test_extract_units),
    but the Python boundary exchanges ``pyarrow.RecordBatch`` directly
    instead of round-tripping each batch through a pandas block
    manager. The classify/extract math already runs on Arrow buffers
    and numpy (classify_payload_batch builds a ``pa.array`` first
    thing), so the pandas frame in the middle is pure conversion
    overhead — this path shares the array-level core
    (:func:`_extract_arrays`) with the pandas boundary: only the text
    column is lifted to a bare Series (the kernel's masked dispatch is
    pandas-shaped), conv_id/role pass through as the input's own Arrow
    arrays untouched, and the output RecordBatch is assembled with
    ``from_arrays`` against an explicit schema (no output DataFrame, no
    ``from_pandas``, list<struct> spans never infer). Same narrow
    no-shuffle plan: scan → project → MapInArrow. Use whichever
    boundary profiles faster on the target wheel; the contract is that
    both exist and agree byte-for-byte."""
    import pyarrow as pa

    if plain_variant not in PLAIN_VARIANTS:
        raise ValueError(f"unknown plain_variant {plain_variant!r}")
    src = transcripts.select("conv_id", "turn_idx", "role", "text")
    out_schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("payload_kind", pa.string()),
            ("text", pa.string()),
            (
                "spans",
                pa.list_(
                    pa.struct(
                        [
                            ("beg", pa.int32()),
                            ("end", pa.int32()),
                            ("kind", pa.string()),
                            ("score", pa.float64()),
                        ]
                    )
                ),
            ),
            ("n_spans", pa.int32()),
        ]
    )

    spans_type = out_schema.field("spans").type

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        import pyarrow.compute as pc

        from .textops import pin_arrow_pools

        pin_arrow_pools()
        for rb in batches:
            if rb.num_rows == 0:
                continue
            cols = {
                name: rb.column(rb.schema.get_field_index(name))
                for name in ("conv_id", "turn_idx", "role", "text")
            }
            # only the text column touches pandas, as a bare Series
            # (the kernel's masked sub-batch dispatch is pandas-shaped);
            # no input DataFrame, no block manager
            texts = cols["text"].to_pandas()
            kinds, text_out, spans_out, n_spans_out = _extract_arrays(
                texts, plain_variant
            )
            yield pa.RecordBatch.from_arrays(
                [
                    cols["conv_id"],  # zero-copy passthrough
                    pc.cast(cols["turn_idx"], pa.int32()),
                    cols["role"],  # zero-copy passthrough
                    pa.array(kinds.to_numpy(), type=pa.string()),
                    pa.array(text_out, type=pa.string()),
                    pa.array(spans_out.tolist(), type=spans_type),
                    pa.array(n_spans_out, type=pa.int32()),
                ],
                schema=out_schema,
            )

    return src.mapInArrow(run, schema=EXTRACT_SCHEMA)


WORD_BOX_SCHEMA = (
    "conv_id string, turn_idx int, line_no int, word_no int, "
    "beg_px double, end_px double"
)


def extract_word_boxes(transcripts: DataFrame) -> DataFrame:
    """Pdfish word-box extraction with the reference's span fixups
    (merge-narrow / split-wide / glue — rules.py word-span constants):
    one narrow mapInPandas stage emitting a row per refined word span.
    Non-pdfish turns produce nothing. Golden-tested vs oracle.word_boxes."""
    src = transcripts.select("conv_id", "turn_idx", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .textops import pin_arrow_pools

        pin_arrow_pools()
        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf["text"].reset_index(drop=True)
            kinds = classify_payload_batch(texts)
            mask = (kinds == PAYLOAD_PDFISH).to_numpy()
            if not mask.any():
                continue
            res = word_spans_batch(texts[mask].reset_index(drop=True))
            rid = res["row"].to_numpy()
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].to_numpy()[mask][rid],
                    "turn_idx": pdf["turn_idx"]
                    .to_numpy()[mask][rid]
                    .astype("int32"),
                    "line_no": res["line_no"].to_numpy().astype("int32"),
                    "word_no": res["word_no"].to_numpy().astype("int32"),
                    "beg_px": res["beg_px"].to_numpy(),
                    "end_px": res["end_px"].to_numpy(),
                }
            )

    return src.mapInPandas(run, schema=WORD_BOX_SCHEMA)


def assemble_conversations(
    extracted: DataFrame, chunk_turns: int = 4096
) -> DataFrame:
    """Concatenate per-turn extracted text into one document per
    conversation, in stable (conv_id, turn_idx) order.

    Order-preserving two-phase aggregation for skew: phase 1 groups by
    (conv_id, chunk = turn_idx div chunk_turns) so a conversation with
    10^6 turns spreads over many reducers; phase 2 merges the (few)
    ordered chunks per conversation. Both phases use sort-based
    ``sort_array(collect_list(struct(...)))`` so the result is
    deterministic regardless of partitioning — the stable-ordering
    invariant (BASELINE.json north_rule).
    """
    chunked = (
        extracted
        .where(F.col("n_spans") > 0)
        .withColumn("chunk", F.expr(f"cast(turn_idx div {chunk_turns} as int)"))
        .groupBy("conv_id", "chunk")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("turn_idx", "text"))
                    ),
                    lambda s: s["text"],
                ),
                "\n\n",
            ).alias("chunk_text"),
            F.count(F.lit(1)).alias("n_turns"),
        )
    )
    return (
        chunked.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("chunk", "chunk_text"))),
                    lambda s: s["chunk_text"],
                ),
                "\n\n",
            ).alias("doc_text"),
            F.sum("n_turns").cast("long").alias("n_turns"),
        )
    )
