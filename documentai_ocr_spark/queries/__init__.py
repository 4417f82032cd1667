"""Query registry — the correctness surface of the engine.

Each module contributes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → equivalent DuckDB SQL, omitted for
ops that are not SQL-expressible). ``__spark_entry__.py`` re-exports the
merged registries; the driver cross-checks every pair at sf=0.01.

Coverage map (SURVEY.md §2 → module):
  §2.1 scans/sources      — every query (parquet scan + pruning)
  §2.2 filters/predicates — relational.q_mean_filter / q_charset_stats
  §2.3 joins              — relational.q_region_revenue / q_anti_missing
  §2.4 aggregations       — relational.q_charfreq / q_fusion_argmax / ...
  §2.5 windows/order      — relational.q_gaps_islands / q_topn_per_group / ...
  §2.6 sorts/set ops      — relational.q_len_hist / q_union_nations / q_train_split
  §2.7 scalar functions   — textstats.* (string/regex/hash exprs)
  §2.8 dedup              — dedup.* (exact / minhash-LSH / simhash / jaccard)
  §2.9 incremental        — lineage.py (tested in pytest, not SQL-expressible)
  §2.10 UDF surface       — extraction.* (mapInPandas kernels, golden-tested)
  training-data ops       — dedup.*, simsearch.*, textstats.*
"""

from __future__ import annotations

from . import (
    corpusops,
    dedup,
    extraction,
    labeldsl,
    relational,
    relevance,
    simsearch,
    textstats,
    webtext,
)

_MODULES = (
    relational,
    dedup,
    textstats,
    simsearch,
    relevance,
    corpusops,
    extraction,
    labeldsl,
    webtext,
)

QUERIES = {}
ORACLES = {}
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLES.update(getattr(_m, "ORACLES", {}))

__all__ = ["QUERIES", "ORACLES"]
