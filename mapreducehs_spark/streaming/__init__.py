from mapreducehs_spark.streaming.ops import (
    events_stream,
    prepare_stream_dir,
    run_to_batch,
    session_aggregate,
    stateful_user_totals,
    tumbling_aggregate,
)

__all__ = [
    "events_stream",
    "prepare_stream_dir",
    "run_to_batch",
    "session_aggregate",
    "stateful_user_totals",
    "tumbling_aggregate",
]
