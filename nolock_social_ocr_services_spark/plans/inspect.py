"""Physical-plan inspection helpers: the asserts that keep the plan the
plan we designed (1 scan / 1 shuffle / vectorized UDF nodes / pushdown)
as the code evolves. Used by tests/test_plans.py; also handy in a REPL:

    from nolock_social_ocr_services_spark.plans import explain_str
    print(explain_str(df))
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scan_count(df: DataFrame, fmt: str = "parquet") -> int:
    return explain_str(df).count(f"Scan {fmt}")


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges (excluding broadcast exchanges and reuses)."""
    plan = explain_str(df)
    return len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange ", plan))


def arrow_eval_count(df: DataFrame) -> int:
    """Vectorized Python UDF nodes (ArrowEvalPython); a BatchEvalPython
    node would mean a row-at-a-time Python UDF slipped in (forbidden)."""
    return explain_str(df).count("ArrowEvalPython")


def batch_eval_count(df: DataFrame) -> int:
    return explain_str(df).count("BatchEvalPython")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node ('' if none)."""
    m = re.search(r"PushedFilters: \[([^\]]*)\]", explain_str(df))
    return m.group(1) if m else ""


def read_schema(df: DataFrame) -> str:
    m = re.search(r"ReadSchema: ([^\n]*)", explain_str(df))
    return m.group(1) if m else ""
