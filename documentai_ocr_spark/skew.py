"""Explicit skew handling: salted aggregation and salted broadcast-side
replication join (SURVEY.md §4 custom work #1; the north_star's
"conv_id salting plus AQE skew-join handling").

AQE's skew-join splitting covers sort-merge joins at runtime; these
helpers cover the two places AQE cannot help:

* ``salted_agg`` — a groupBy where one key dominates (a 10^8-turn
  conversation): pre-aggregate on (key, salt) so the hot key spreads
  over ``n_salt`` reducers, then merge. Only algebraic aggregates
  (sum/count/min/max) qualify — the caller passes both phases.
* ``replicated_join`` — big ⋈ medium where the big side has hot keys and
  the medium side is too large to broadcast whole: replicate each medium
  row ``n_salt``× with an explicit salt, salt the big side by hash of a
  row-unique column, and equi-join on (key, salt). Shuffle of the big
  side is uniform by construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, n_salt: int) -> DataFrame:
    """Deterministic uniform salt derived from a row-unique column (never
    rand() — reruns must partition identically for resume/tests)."""
    return df.withColumn(
        "salt", F.pmod(F.xxhash64(unique_col), F.lit(n_salt)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    key: str,
    unique_col: str,
    partial: list[Column],
    merge: list[Column],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) → partial aggs →
    groupBy(key) → merge aggs. ``partial`` aggregates raw columns;
    ``merge`` re-aggregates the partial outputs (aliases must line up)."""
    return (
        with_salt(df, unique_col, n_salt)
        .groupBy(key, "salt")
        .agg(*partial)
        .groupBy(key)
        .agg(*merge)
    )


def replicated_join(
    big: DataFrame,
    medium: DataFrame,
    key: str,
    big_unique_col: str,
    n_salt: int = 8,
) -> DataFrame:
    """Equi-join with explicit salt replication: medium side exploded
    ``n_salt``×, big side salted uniformly. The join key becomes
    (key, salt) so a hot key's rows land on n_salt reducers."""
    med_rep = medium.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("salt", F.col("salt").cast("int"))
    big_salted = with_salt(big, big_unique_col, n_salt)
    return big_salted.join(med_rep, [key, "salt"]).drop("salt")
