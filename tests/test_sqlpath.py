"""Pure-Catalyst plain path: bit-identical to the Arrow kernel and the
oracle, and verifiably Python-free in the physical plan."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from documentai_ocr_spark.extract import extract_turns
from documentai_ocr_spark.extract.sqlpath import (
    extract_plain_sql,
    extract_turns_hybrid,
)
from documentai_ocr_spark.oracle import extract_turn
from documentai_ocr_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def fixture_pdf():
    return synth_transcripts(n_convs=15, seed=42, skew_factor=8)


def _key(df_rows):
    return {
        (r.conv_id, r.turn_idx): (
            r.payload_kind,
            r.text,
            [(s.beg, s.end, s.kind, s.score) for s in r.spans],  # full precision
            r.n_spans,
        )
        for r in df_rows
    }


def test_hybrid_equals_kernel_bitwise(spark, fixture_pdf):
    df = spark.createDataFrame(fixture_pdf).repartition(5)
    ka = extract_turns(df)
    kb = extract_turns_hybrid(df)
    # the contract is byte-for-byte INCLUDING the physical schema: a
    # widened n_spans (bigint vs int) would break readers that re-apply
    # EXTRACT_SCHEMA on written output (the lineage.py pattern)
    assert [(f.name, f.dataType) for f in ka.schema.fields] == [
        (f.name, f.dataType) for f in kb.schema.fields
    ]
    a = _key(ka.collect())
    b = _key(kb.collect())
    assert a == b


def test_sql_plain_matches_oracle_on_edges(spark):
    cases = [
        "good content line with words here.\nnav: home | products\nmore of the decent content",
        "\x1c  padded with odd whitespace content line here  \x1c",
        "\xa0\xa0 unicode space padded content line here 　",
        "",
        "short\nok",
        "a" * 500,
        "Copyright 2024 Example Corp. All rights reserved.",
    ]
    df = spark.createDataFrame(pd.DataFrame({"text": cases}))
    rows = extract_plain_sql(df.withColumn("i", F.monotonically_increasing_id())).collect()
    got = {r.i: r for r in rows}
    by_pos = sorted(got)
    from documentai_ocr_spark.oracle import extract_plain

    for pos, case in zip(by_pos, cases):
        want_text, want_spans = extract_plain(case)
        r = got[pos]
        assert r.text == want_text, repr(case)
        assert [
            (s.beg, s.end, s.kind, s.score) for s in r.spans
        ] == [
            (s["beg"], s["end"], s["kind"], s["score"]) for s in want_spans
        ], repr(case)


def test_sql_plain_plan_is_python_free(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["abc def ghi jkl mno"]}))
    p = df._sc._jvm.PythonSQLUtils.explainString(
        extract_plain_sql(df)._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" not in p and "MapInPandas" not in p
    assert "Exchange" not in p
