"""Time-window and sessionization operators over event streams (batch form).

The reference has no time semantics at all (SURVEY §2.2 "Streaming");
these are the batch-mode equivalents of Structured Streaming's windowed
aggregations, kept batch-first so they are DuckDB-oracle testable.  The
streaming variants live in ``mapreducehs_spark.streaming``.

Scale: tumbling/sliding lower to a single hash aggregation on
(window, keys) — Spark's partial aggregation handles 100 TB fine.
Sessionization is one shuffle on the session key plus two ordered
window passes; per-user event counts are bounded in practice, and AQE
skew handling covers hot users.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window(
    df: DataFrame, ts: str, duration: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    """Non-overlapping windows of ``duration`` (e.g. ``'10 minutes'``).

    Output has ``window_start``/``window_end`` timestamp columns.
    """
    return (
        df.groupBy(F.window(ts, duration).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sliding_window(
    df: DataFrame, ts: str, duration: str, slide: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    """Overlapping windows: each row lands in duration/slide windows."""
    return (
        df.groupBy(F.window(ts, duration, slide).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )


def sessionize(
    df: DataFrame,
    ts: str,
    key: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign a session id per ``key``: a new session starts when the
    gap from the previous event exceeds ``gap_seconds``.

    Classic lag + gap-flag + running-sum construction — two passes over
    one partitioning, no UDFs.  Adds ``session_id`` (0-based within
    key).
    """
    order_cols = [F.col(ts).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order_cols)
    gap = F.col(ts).cast("double") - F.lag(F.col(ts).cast("double")).over(w)
    new_session = F.when(gap.isNull() | (gap > float(gap_seconds)), 1).otherwise(0)
    running = Window.partitionBy(key).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("__new", new_session).withColumn(
        "session_id", (F.sum("__new").over(running) - F.lit(1)).cast("bigint")
    ).drop("__new")


def session_aggregate(
    df: DataFrame, ts: str, key: str, gap_seconds: int, order_tiebreak: str | None = None
) -> DataFrame:
    """Sessionize then collapse to one row per (key, session):
    event count, start/end epoch seconds, duration."""
    s = sessionize(df, ts, key, gap_seconds, order_tiebreak)
    return s.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.floor(F.min(F.col(ts).cast("double"))).cast("bigint").alias("start_epoch"),
        F.floor(F.max(F.col(ts).cast("double"))).cast("bigint").alias("end_epoch"),
        (
            F.floor(F.max(F.col(ts).cast("double")))
            - F.floor(F.min(F.col(ts).cast("double")))
        ).cast("bigint").alias("duration_sec"),
    )
