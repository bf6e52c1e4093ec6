"""Plan-inspection helpers: assert that the physical plan actually has the
shape the 100 TB design requires (pushdown reached the scan, dims broadcast,
codegen covers the narrow pipeline)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def pruned_columns(df: DataFrame) -> list[str]:
    """Column list the scan actually reads (from ReadSchema)."""
    plan = formatted_plan(df)
    out = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inside = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            out.extend(f.split(":")[0] for f in inside.split(",") if ":" in f)
    return out

def count_broadcast_joins(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def count_codegen_stages(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (formatted mode tags operators with
    `[codegen id : N]`)."""
    import re

    ids = re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df))
    return len(set(ids))
