"""Incremental index maintenance — Structured Streaming extension
(SURVEY.md §1.1 last row, §2 A10/I).

The reference's only incremental machinery is FTS sync triggers that
the batch indexer bypasses and rebuilds (utils.py:57-65).  The Spark
upgrade: treat new items as a stream and merge each micro-batch into
the persisted search_index with the SAME conform + last-writer-wins
semantics as the batch indexer — so a stream of updates converges to
exactly what a batch rebuild would produce (tested in
tests/test_streaming.py).

Also provides watermarked tumbling-window facet counts over the raw
event stream — the streaming analog of the date facet (D3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dogsheep_beta_spark.operators.conform import conform
from dogsheep_beta_spark.operators.upsert import last_writer_wins, union_conformed


def merge_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    type_tag: str,
) -> None:
    """foreachBatch body: conform the micro-batch and upsert it into
    the Parquet index (read → union → dedup → overwrite).

    Local-mode simplification of a Delta/Iceberg MERGE: at cluster
    scale the same conform+dedup plan feeds ``MERGE WHEN MATCHED``
    instead of a full rewrite, but the *semantics* (per-pk
    last-writer-wins with the batch as the newer writer) are identical.
    """
    incoming = conform(batch_df, type_tag).withColumn("load_seq", F.lit(1))
    try:
        existing = spark.read.parquet(index_path).withColumn("load_seq", F.lit(0))
        merged = last_writer_wins(union_conformed([existing, incoming]))
    except Exception:  # first batch: nothing to merge yet
        merged = last_writer_wins(incoming)
    # write to a temp dir then swap would be the production move; for the
    # local engine a cached materialization before overwrite suffices.
    merged.cache().count()
    merged.write.mode("overwrite").parquet(index_path)
    merged.unpersist()


def incremental_index_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    index_path: str,
    type_tag: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Wire a conformed stream into the index via foreachBatch merge."""
    writer = (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda bdf, bid: merge_batch(spark, bdf, bid, index_path, type_tag)
        )
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts — streaming facet analog.

    Late rows beyond the watermark are dropped; state is bounded by
    (#windows in watermark horizon × #keys), which is what makes this
    run forever on an unbounded stream.
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "count",
        )
    )
