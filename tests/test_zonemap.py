"""x_zonemap_audit: the file-provenance governance gate. The driver's
DuckDB views erase file identity, so the cross-engine check lives
HERE, with path-aware read_parquet(filename=true) SQL, at three SFs —
plus an engineered two-file fixture pinning the overlap semantics
(disjoint ranges → 0; nested/partial overlap → counted; single file →
0 by the no-self rule).
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from documentai_ocr_spark.queries.corpusops import x_zonemap_audit

SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

_ORACLE_SQL = """
WITH d AS (
  SELECT regexp_extract(filename, '([^/]+)$', 1) AS file, doc_id
  FROM read_parquet('{path}', filename=true)
),
pf AS (SELECT file, CAST(COUNT(*) AS bigint) AS n_rows,
              CAST(MIN(doc_id) AS bigint) AS min_id,
              CAST(MAX(doc_id) AS bigint) AS max_id
       FROM d GROUP BY 1)
SELECT a.file, a.n_rows, a.min_id, a.max_id,
       CAST(COUNT(b.file) AS bigint) AS n_overlapping_files
FROM pf a LEFT JOIN pf b
  ON a.file <> b.file AND a.min_id <= b.max_id AND b.min_id <= a.max_id
GROUP BY 1, 2, 3, 4
"""


def _oracle(path_glob: str):
    con = duckdb.connect()
    rows = con.sql(_ORACLE_SQL.format(path=path_glob)).fetchall()
    con.close()
    return sorted(rows)


@pytest.mark.parametrize("sf", SFS)
def test_zonemap_matches_duckdb(spark, sf):
    got = sorted(
        (r.file, r.n_rows, r.min_id, r.max_id, r.n_overlapping_files)
        for r in x_zonemap_audit(spark, sf).collect()
    )
    want = _oracle(os.path.join(sf, "documents.parquet"))
    # single-file tables still give one row with 0 overlaps
    assert got == want
    assert len(got) >= 1


def test_zonemap_overlap_semantics(spark, tmp_path):
    """Three files: A=[0,9], B=[10,19] (disjoint from A),
    C=[5,14] (overlaps both)."""
    base = str(tmp_path / "docs")
    frames = {
        "a": range(0, 10),
        "b": range(10, 20),
        "c": list(range(5, 15)),
    }
    os.makedirs(base)
    for name, ids in frames.items():
        pd.DataFrame({"doc_id": list(ids)}).to_parquet(
            os.path.join(base, f"part-{name}.parquet")
        )

    class _Shim:
        pass

    # drive the operator directly over the fixture dir: x_zonemap_audit
    # loads f"{sf_dir}/documents.parquet", so shape the dir accordingly
    docs_dir = str(tmp_path / "sf" / "documents.parquet")
    os.makedirs(os.path.dirname(docs_dir))
    os.rename(base, docs_dir)
    out = {
        r.file: (r.n_rows, r.min_id, r.max_id, r.n_overlapping_files)
        for r in x_zonemap_audit(spark, str(tmp_path / "sf")).collect()
    }
    assert out["part-a.parquet"] == (10, 0, 9, 1)   # only C overlaps
    assert out["part-b.parquet"] == (10, 10, 19, 1)  # only C
    assert out["part-c.parquet"] == (10, 5, 14, 2)   # A and B
    want = _oracle(os.path.join(docs_dir, "*.parquet"))
    got = sorted((f, *v) for f, v in out.items())
    assert got == want
