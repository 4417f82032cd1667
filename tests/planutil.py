"""Shared physical-plan helpers for the plan-shape tests (single wrapper
around the private explainString JVM entry point — one place to fix on a
Spark upgrade)."""

import re


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def n_exchanges(p: str) -> int:
    """Count Exchange nodes via the formatted plan's detail section
    ("(6) Exchange" — one line per node)."""
    return len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE))
