"""Streaming trending terms — the text-tokenizing stream twin.

The batch board (operators/textstats.py::trending_terms) as a stream:
documents readStream → the SAME explode_terms tokenizer (pure codegen +
a stream-static broadcast join against the lemma dictionary — both
streaming-legal) → watermarked event-time window counts → append sink.
State is bounded by open windows × live vocabulary, not the stream; docs
later than the watermark drop, the standard trade every unbounded text
feed makes.

The per-window TOP-K cut deliberately happens on the SINK table, not in
the stream: append mode emits a window only once it closes, and a rank
inside the streaming agg would need the closed window anyway — so the
stream materializes (window, term, n) and the board query ranks the
(tiny) closed-window table. tests/test_streaming.py pins stream == batch
counts including a late-arrival drop."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def stream_docs(spark: SparkSession, input_glob: str) -> DataFrame:
    return spark.readStream.schema(DOCS_SCHEMA).parquet(input_glob)


def trending_counts_stream(
    docs: DataFrame,
    watermark: str = "30 minutes",
    window: str = "1 hour",
) -> DataFrame:
    from ..functions.text_columns import explode_terms

    terms = explode_terms(docs, keep=["doc_id", "warc_ts"])
    return (
        terms.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "term")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").cast("long").alias("bucket_epoch"),
            "term",
            F.col("n").cast("long").alias("n"),
        )
    )


def run_trends_to_memory(
    spark: SparkSession,
    input_glob: str,
    checkpoint_dir: str,
    table_name: str = "stream_trends",
) -> DataFrame:
    q = (
        trending_counts_stream(stream_docs(spark, input_glob))
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
