"""Watermarked stream-stream interval join — view→click attribution.

The batch interval self-join (operators/events.py::attribution_pairs) run
as a STREAM-STREAM join, the one Structured Streaming capability the other
twins don't exercise: both sides are unbounded, so Spark must buffer each
side's rows in state until the other side's watermark proves no more
matches can arrive. The time-bound join condition
(`c.ts BETWEEN v.ts AND v.ts + window`) plus watermarks on BOTH inputs is
exactly what lets the state store evict: a buffered view older than
(click watermark − window) can never match a future click, and vice versa
— bounded state over an unbounded ads/telemetry feed, the canonical
attribution-pipeline shape.

Semantics match the batch operator row-for-row (inner join, inclusive
bounds, microsecond-exact lag); the equivalence is pinned by
tests/test_streaming.py::test_stream_attribution_matches_batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.events import ATTRIBUTION_WINDOW_SECS
from .stream_events import stream_events

# one canonical events-stream reader (stream_events.py owns the schema);
# re-exported under the module-local name the attribution tests use
stream_events_source = stream_events


def attribution_stream(
    events: DataFrame,
    window_secs: int = ATTRIBUTION_WINDOW_SECS,
    watermark: str = "2 hours",
) -> DataFrame:
    """events stream → (view_id, click_id, user_id, lag_s): per-user
    view→click pairs within ``window_secs``, as a watermarked
    stream-stream inner join. One source is split into the two logical
    streams by event_type filter (each side carries its own watermark —
    required for state eviction on stream-stream joins)."""
    ts = F.col("ts").cast("timestamp")
    v = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            ts.alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            ts.alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (
            F.col("c_ts")
            <= F.col("v_ts") + F.expr(f"INTERVAL {int(window_secs)} SECONDS")
        )
    )
    return v.join(c, cond, "inner").select(
        "view_id",
        "click_id",
        F.col("v_user").alias("user_id"),
        (
            (F.unix_micros(F.col("c_ts")) - F.unix_micros(F.col("v_ts")))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("lag_s"),
    )


def run_attribution_to_memory(
    spark: SparkSession,
    input_glob: str,
    checkpoint_dir: str,
    table_name: str = "stream_attrib",
    window_secs: int = ATTRIBUTION_WINDOW_SECS,
) -> DataFrame:
    """Drive the join with availableNow into an in-memory sink (append
    mode — stream-stream inner joins emit as soon as both sides match);
    returns the result table."""
    src = stream_events_source(spark, input_glob)
    q = (
        attribution_stream(src, window_secs=window_secs)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
