"""Streaming COEC — windowed position-bias-corrected CTR.

The batch operator (operators/events.py::coec_scores) computes its
position priors and per-item scores from one log; the PRODUCTION shape
splits them: priors are slow-moving global statistics refreshed by the
batch job, while per-item clicks/expected-clicks accumulate on the live
stream. This twin takes the batch priors as a driver-side dict (a
broadcast literal — the stream-static pattern every stream twin here
uses for frozen assets) and emits per (event-time window, item):

    views, clicks, expected_clicks = Σ view-event prior(position),
    with COEC = clicks / EC computed on the CLOSED window (append mode
    emits a window once the watermark passes — the same sink-side-rank
    rationale as stream_trends).

Item/position derive exactly as in batch (props.k, event_id % n + 1),
so a closed stream window over the same rows equals the batch
aggregation restricted to that window — pinned by the test.

State is bounded by open windows × live items; late events past the
watermark drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.events import N_SERP_POSITIONS

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


def coec_window_stream(
    events: DataFrame,
    priors: dict[int, float],
    n_positions: int = N_SERP_POSITIONS,
    watermark: str = "30 minutes",
    window: str = "1 hour",
) -> DataFrame:
    """(bucket_epoch, k, views, clicks, expected_clicks): watermarked
    tumbling-window accumulation under the FROZEN position priors.
    COEC itself = clicks / expected_clicks on the emitted (closed)
    rows — left to the sink query so the stream stays append-legal."""
    prior_map = F.create_map(
        *[
            x
            for p, v in sorted(priors.items())
            for x in (F.lit(int(p)), F.lit(float(v)))
        ]
    )
    base = events.filter(
        F.col("event_type").isin("view", "click")
    ).select(
        "ts",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        ((F.col("event_id") % n_positions) + 1).alias("pos"),
        (F.col("event_type") == "click").cast("long").alias("is_click"),
        (F.col("event_type") == "view").cast("long").alias("is_view"),
    )
    return (
        base.withColumn(
            "prior", F.coalesce(prior_map[F.col("pos")], F.lit(0.0))
        )
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "k")
        .agg(
            F.sum("is_view").alias("views"),
            F.sum("is_click").alias("clicks"),
            F.round(F.sum(F.col("is_view") * F.col("prior")), 4).alias(
                "expected_clicks"
            ),
        )
        .select(
            F.col("w.start").cast("long").alias("bucket_epoch"),
            "k",
            "views",
            "clicks",
            "expected_clicks",
        )
    )


def run_coec_to_memory(
    spark: SparkSession,
    input_glob: str,
    priors: dict[int, float],
    checkpoint_dir: str,
    table_name: str = "stream_coec",
) -> DataFrame:
    q = (
        coec_window_stream(stream_events(spark, input_glob), priors)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
