"""Three-way proof of the plain extraction contract: the Arrow kernel,
run on the exact payloads q_extract_plain_runs synthesizes, must produce
the same runs and codepoint offsets as the pure-Catalyst query — which
the gate separately value-hash-checks against DuckDB. Kernel == SQL ==
DuckDB, one semantics."""

import pandas as pd

from documentai_ocr_spark.extract.textops import extract_plain_batch
from documentai_ocr_spark.queries.relational import (
    _synth_lines,
    q_extract_plain_runs,
)

SF = "/root/testdata/sf0.001"


def test_kernel_matches_sql_runs(spark):
    rows = _synth_lines(spark, SF).collect()
    per_doc: dict = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.li)):
        per_doc.setdefault(r.doc_id, []).append(r.s)
    docs = sorted(per_doc)
    payloads = ["\n".join(per_doc[d]) for d in docs]
    out = extract_plain_batch(pd.Series(payloads))

    want: dict = {}
    for i, d in enumerate(docs):
        text = out["text"].iloc[i]
        for j, sp in enumerate(out["spans"].iloc[i]):
            want[(d, j + 1)] = (sp["beg"], sp["end"],
                                text[sp["beg"] : sp["end"]])

    got = {
        (r.doc_id, r.run_no): (r.beg, r.end, r.run_text)
        for r in q_extract_plain_runs(spark, SF).collect()
    }
    assert got == want
    assert len(got) > 200  # the fixture genuinely exercises runs
