from mapreducehs_spark.streaming.ops import (
    FLUSH_TYPE,
    clicks_then_purchases,
    enrich_with_dim,
    events_stream,
    prepare_late_stream_dir,
    prepare_stream_dir,
    run_to_batch,
    session_aggregate,
    sliding_aggregate,
    stateful_user_totals,
    stream_distinct,
    tumbling_aggregate,
)

__all__ = [
    "FLUSH_TYPE",
    "clicks_then_purchases",
    "enrich_with_dim",
    "events_stream",
    "prepare_late_stream_dir",
    "prepare_stream_dir",
    "run_to_batch",
    "session_aggregate",
    "sliding_aggregate",
    "stateful_user_totals",
    "stream_distinct",
    "tumbling_aggregate",
]
