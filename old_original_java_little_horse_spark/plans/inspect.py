"""Plan-inspection helpers: assert the physical plan is the one you
want (pushdown reached the scan, the join broadcast, no stray
exchange) instead of eyeballing `.explain()` output."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def physical_ops(df: DataFrame) -> list[str]:
    """Operator names appearing in the formatted physical plan."""
    txt = explain_str(df)
    return re.findall(r"^\s*\(\d+\)\s+([A-Za-z]+)", txt, flags=re.M)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (lower is better)."""
    return sum(1 for op in physical_ops(df) if op == "Exchange")


def pushed_filters(df: DataFrame) -> list[str]:
    txt = explain_str(df)
    return re.findall(r"PushedFilters:\s*\[([^\]]*)\]", txt)
