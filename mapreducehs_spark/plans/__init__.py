from mapreducehs_spark.plans.inspect import (
    broadcast_join_count,
    codegen_stage_count,
    exchange_count,
    formatted_plan,
    pushed_filters,
    read_schemas,
    scan_columns,
)

__all__ = [
    "broadcast_join_count",
    "codegen_stage_count",
    "exchange_count",
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "scan_columns",
]
