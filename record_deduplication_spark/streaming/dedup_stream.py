"""Structured-Streaming ingestion dedup.

The reference is batch-only (SURVEY §2.9) — this is a forward-looking
engine component for continuous corpus ingestion: as new clips stream
in, drop exact duplicates (sha256(bytes)+transcript key) within a
watermarked window, and maintain running per-codec counters.

Patterns: readStream over files -> dropDuplicatesWithinWatermark (state
store bounded by the watermark) -> append sink. The signature stage is
reused for near-dup candidate *signatures* so a downstream batch job
can join fresh arrivals against the existing LSH index incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CLIPS_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("sr_hz", T.IntegerType()),
    T.StructField("dur_ms", T.IntegerType()),
    T.StructField("codec", T.StringType()),
    T.StructField("transcript", T.StringType()),
])


def read_clip_stream(spark: SparkSession, path: str,
                     max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream
            .schema(CLIPS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path)
            .withColumn("ingest_ts", F.current_timestamp()))


def exact_dedup_stream(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Exact-dup suppression on (sha256(bytes), transcript) with bounded
    state: duplicates arriving within the watermark horizon are dropped."""
    keyed = stream.withColumn("dup_key",
                              F.concat_ws("|", F.sha2("bytes", 256),
                                          F.coalesce("transcript", F.lit(""))))
    return (keyed
            .withWatermark("ingest_ts", watermark)
            .dropDuplicatesWithinWatermark(["dup_key"])
            .drop("dup_key"))


def windowed_event_counts(events: DataFrame, ts_col: str = "ts",
                          window: str = "1 hour",
                          watermark: str | None = None) -> DataFrame:
    """Tumbling-window event counters over EVENT TIME.

    The same function serves two surfaces:
    - streaming: with `watermark`, state is bounded and append-mode
      emission finalizes a window once the watermark passes its end;
      events later than the horizon are dropped (late-data contract,
      tested in tests/test_streaming.py);
    - batch: identical plan minus the watermark — this is the
      `events_windowed_stream_twin` DuckDB-gated query, so the
      streaming aggregation logic sits under the hash gate too.
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(ts_col, window).alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 3).alias("total_value"))
            .select(F.col("win.start").alias("win_start"),
                    "event_type", "n_events", "total_value"))


def codec_counters(stream: DataFrame, window: str = "1 minute") -> DataFrame:
    """Windowed ingestion counters (tumbling)."""
    return (stream
            .withWatermark("ingest_ts", window)
            .groupBy(F.window("ingest_ts", window), "codec")
            .agg(F.count(F.lit(1)).alias("n_clips"),
                 F.sum(F.length("bytes").cast("bigint")).alias("bytes_in")))


def run_batchwise(spark: SparkSession, in_path: str, out_path: str,
                  checkpoint: str) -> None:
    """Drive the streaming dedup to completion over the files currently
    in `in_path` (local smoke; on a cluster this runs continuously)."""
    q = (exact_dedup_stream(read_clip_stream(spark, in_path))
         .drop("bytes")
         .writeStream
         .format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
