"""Structured Streaming event-time aggregation with watermark.

The batch tumbling aggregation (operators/events.py::windowed_counts) run
as a stream: file-source readStream → 10-minute watermark → 1-hour
windowed counts → append-mode sink. Late events inside the watermark fold
into their window; events later than the watermark drop — the standard
bounded-state design, which is what makes hour-window counts feasible over
an unbounded 10^12-event log (state = open windows × event types, not the
stream)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(spark: SparkSession, input_glob: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(input_glob)


def windowed_counts_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Same logical aggregation as events.windowed_counts, with the
    watermark bounding streaming state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n", "sum_value"
        )
    )


def run_windowed_to_memory(
    spark: SparkSession,
    input_glob: str,
    checkpoint_dir: str,
    table_name: str = "stream_windows",
) -> DataFrame:
    """Drive the stream with availableNow into an in-memory sink (append
    mode: only watermark-closed windows emit); returns the result table."""
    q = (
        windowed_counts_stream(stream_events(spark, input_glob))
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
