"""Physical-plan inspection helpers: assert the plan properties this
engine is designed around (pushdown, pruning, broadcast, rank-limit) so
regressions in plan shape fail tests instead of silently degrading at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["physical_plan", "scan_columns", "assert_plan"]


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet FileScan in the plan —
    the ground truth for column pruning."""
    import re

    out = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\]", physical_plan(df)):
        cols = [c.split("#")[0] for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def assert_plan(
    df: DataFrame,
    contains: tuple = (),
    not_contains: tuple = (),
    max_scan_columns: int | None = None,
) -> None:
    plan = physical_plan(df)
    for needle in contains:
        assert needle in plan, f"plan missing {needle!r}:\n{plan[:2000]}"
    for needle in not_contains:
        assert needle not in plan, f"plan unexpectedly contains {needle!r}"
    if max_scan_columns is not None:
        for cols in scan_columns(df):
            assert len(cols) <= max_scan_columns, (
                f"scan reads {len(cols)} columns ({cols}); "
                f"expected <= {max_scan_columns} — column pruning regressed"
            )
