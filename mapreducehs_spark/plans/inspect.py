"""Physical-plan inspection: make the 100 TB plan properties testable.

The reference has no optimizer at all (SURVEY §4.1 — stages run exactly
as written, no pushdown/pruning/fusion).  In the new engine those
properties come from Catalyst, but *silently losing* one (a filter that
stops pushing down, a broadcast that degrades to sort-merge) is exactly
the regression class that only shows up at scale.  These helpers parse
``explain("formatted")`` output so tests can assert:

- predicate pushdown reached the parquet scan (``PushedFilters``),
- column pruning happened (``ReadSchema`` holds only needed columns),
- small dimensions joined via ``BroadcastHashJoin``,
- shuffle (``Exchange``) counts stay at the expected minimum,
- whole-stage codegen covers the hot path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The string `df.explain('formatted')` would print."""
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> dict[str, str]:
    """Map of scan location → its PushedFilters text.

    Keyed by the scan's file path fragment (table name for our catalog),
    so a multi-table plan can be asserted per table.
    """
    plan = formatted_plan(df)
    out: dict[str, str] = {}
    # formatted explain lists scan nodes as blocks:
    #   (1) Scan parquet \n Output [...] \n Location: ... path/lineitem.parquet ...
    #   PushedFilters: [IsNotNull(l_shipdate), ...]
    blocks = re.split(r"\n\(\d+\) ", plan)
    for b in blocks:
        if not b.startswith("Scan parquet"):
            continue
        loc = re.search(r"Location:.*?/(\w+)\.parquet", b)
        pf = re.search(r"PushedFilters: \[(.*?)\]", b)
        if loc:
            out[loc.group(1)] = pf.group(1) if pf else ""
    return out


def read_schemas(df: DataFrame) -> dict[str, list[str]]:
    """Map of scan table → columns actually read (column pruning check)."""
    plan = formatted_plan(df)
    out: dict[str, list[str]] = {}
    blocks = re.split(r"\n\(\d+\) ", plan)
    for b in blocks:
        if not b.startswith("Scan parquet"):
            continue
        loc = re.search(r"Location:.*?/(\w+)\.parquet", b)
        rs = re.search(r"ReadSchema: struct<(.*?)>", b, re.DOTALL)
        if loc and rs:
            cols = [c.split(":")[0].strip() for c in rs.group(1).split(",") if ":" in c]
            out[loc.group(1)] = cols
    return out


def scan_columns(df: DataFrame, table: str) -> list[str]:
    return read_schemas(df).get(table, [])


def broadcast_join_count(df: DataFrame) -> int:
    """BroadcastHashJoin + BroadcastNestedLoopJoin nodes in the plan."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Broadcast(?:Hash|NestedLoop)Join", plan))


def sort_merge_join_count(df: DataFrame) -> int:
    # match the numbered node line only — the formatted tree renders
    # every node twice (tree header + numbered detail block)
    return len(re.findall(r"\(\d+\) SortMergeJoin", formatted_plan(df)))


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges (excludes broadcast exchanges) — each is a full
    network materialization; the number to minimize."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange", plan))


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (formatted explain tags
    participating operators with ``[codegen id : N]``)."""
    plan = formatted_plan(df)
    return len(set(re.findall(r"codegen id : (\d+)", plan)))
