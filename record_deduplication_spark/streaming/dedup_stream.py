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
    state: duplicates arriving within the watermark horizon are dropped.

    Rows with NULL bytes (failed fetch/decode) cannot be byte-exact
    duplicates of anything: their key falls back to the clip_id so two
    distinct NULL-bytes clips sharing a transcript are never collapsed
    (concat_ws silently SKIPS a NULL sha2, which would have keyed them
    by transcript alone)."""
    keyed = stream.withColumn(
        "dup_key",
        F.when(F.col("bytes").isNull(),
               F.concat(F.lit("nullbytes|"), F.col("clip_id")))
         .otherwise(F.concat_ws("|", F.sha2("bytes", 256),
                                F.coalesce("transcript", F.lit("")))))
    return (keyed
            .withWatermark("ingest_ts", watermark)
            .dropDuplicatesWithinWatermark(["dup_key"])
            .drop("dup_key"))


def windowed_event_counts(events: DataFrame, ts_col: str = "ts",
                          window: str = "1 hour",
                          watermark: str | None = None,
                          slide: str | None = None) -> DataFrame:
    """Tumbling (or, with `slide`, sliding/hopping) event counters
    over EVENT TIME.

    The same function serves two surfaces:
    - streaming: with `watermark`, state is bounded and append-mode
      emission finalizes a window once the watermark passes its end;
      events later than the horizon are dropped (late-data contract,
      tested in tests/test_streaming.py);
    - batch: identical plan minus the watermark — this is the
      `events_windowed_stream_twin` / `events_sliding_twin` DuckDB-
      gated query pair, so the streaming aggregation logic sits under
      the hash gate too.
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = (F.window(ts_col, window, slide) if slide
           else F.window(ts_col, window))
    return (df.groupBy(win.alias("win"), "event_type")
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


NEARDUP_OUT_SCHEMA = ("clip_id string, block_key string, fp bigint, "
                      "novel boolean, n_seen int")


def near_dup_suppress_stream(stream: DataFrame, hamming_k: int = 3,
                             max_state_fps: int = 256,
                             fp_col: str = "fp",
                             key_col: str = "block_key") -> DataFrame:
    """Custom STATEFUL near-dup suppression (`applyInPandasWithState`).

    ``dropDuplicatesWithinWatermark`` only does exact keys; near-dup
    needs "is this fingerprint within Hamming-k of anything seen in
    this block before, across micro-batches" — a custom stateful
    operator. State per block key = the fingerprints seen so far,
    hard-bounded to the `max_state_fps` most recent so the store
    cannot grow with stream lifetime. Each arriving clip is marked
    `novel` iff no stored fingerprint is within Hamming-k; novel
    fingerprints join the state.

    Scale shape: state is per-BLOCK (the LSH/SimHash band key the
    batch pipeline also blocks on), so lookups are tiny-list scans,
    the shuffle key equals the blocking key, and hot blocks are
    bounded by `max_state_fps` — the same salting applies upstream if
    a band is pathological.

    Environment limits pin this to the legacy API + size-bounded
    state (both verified by repro in this container, PySpark 4.1.2):
    `transformWithStateInPandas` (which would give RocksDB ListState
    + per-state TTL) needs `google.protobuf`, absent here; and
    `GroupStateTimeout.ProcessingTimeTimeout` NPEs when the runner
    plans the extra timeout-handling batch (SparkPlan.session() null
    in FlatMapGroupsInPandasWithStateExec). On a cluster with
    protobuf, swap in transformWithState and TTL for idle-key
    eviction; the operator contract is unchanged."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # byte-LUT popcount (numpy < 2 has no bitwise_count): XOR against
    # the WHOLE state array at once, then one vectorized table lookup —
    # the r2 version scanned state with bin(fp ^ s).count("1") in a
    # per-row, per-entry Python loop (and Python's bin() on a negative
    # int counts magnitude bits, not two's-complement — the int64 view
    # here is true 64-bit Hamming for the full bigint range).
    # Micro-bench (1000 rows x 256-entry state): 177 ms scalar ->
    # 22 ms vectorized (8.2x); equivalence incl. negative fps asserted
    # in tests/test_streaming.py::test_popcount_lut_equivalence
    pop = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

    def suppress(key, pdfs, state: GroupState):
        prev = list(state.get[0]) if state.exists else []
        # growable buffer with doubling (amortized O(1) append): a
        # np.append per novel fp would copy the whole array each time —
        # O(N^2) on a batch of N mostly-novel fps for one key
        n = len(prev)
        buf = np.empty(max(2 * n, 64), dtype=np.uint64)
        buf[:n] = np.array(prev, dtype=np.int64).view(np.uint64)
        rows = {"clip_id": [], "block_key": [], "fp": [],
                "novel": [], "n_seen": []}
        for pdf in pdfs:
            # Defense-in-depth only: the wrapper filters NULL fps out
            # BEFORE this operator (one NULL makes Arrow deliver the
            # whole column as float64, rounding |fp| > 2^53 — see
            # near_dup_suppress_stream), so this mask should never
            # match; if it somehow does, pass those rows through as
            # novel without the garbage INT64_MIN cast.
            null_mask = pdf[fp_col].isna()
            for cid in pdf.loc[null_mask, "clip_id"]:
                rows["clip_id"].append(cid)
                rows["block_key"].append(key[0])
                rows["fp"].append(None)
                rows["novel"].append(True)
                rows["n_seen"].append(n)
            pdf = pdf.loc[~null_mask]
            fps = pdf[fp_col].to_numpy(dtype=np.int64)
            for cid, fp in zip(pdf["clip_id"], fps):
                u = fp.astype(np.uint64)
                if n:
                    x = np.bitwise_xor(buf[:n], u)
                    dmin = int(pop[x.view(np.uint8)]
                               .reshape(x.size, 8).sum(axis=1).min())
                    novel = dmin > hamming_k
                else:
                    novel = True
                if novel:
                    if n == buf.size:
                        buf = np.concatenate([buf, np.empty_like(buf)])
                    buf[n] = u
                    n += 1
                rows["clip_id"].append(cid)
                rows["block_key"].append(key[0])
                rows["fp"].append(int(fp))
                rows["novel"].append(novel)
                rows["n_seen"].append(n)
        state.update((buf[max(0, n - max_state_fps):n]
                      .view(np.int64).tolist(),))
        yield pd.DataFrame(rows)

    # NULL fingerprints are routed AROUND the stateful operator, not
    # just skipped inside it: one NULL in a micro-batch group makes
    # Arrow hand the kernel the whole fp column as float64, rounding
    # every |fp| > 2^53 (real simhash values) so distinct fingerprints
    # collide and get wrongly suppressed — verified by repro in this
    # container. Filtering nulls upstream keeps each Arrow batch pure
    # int64 (exact); null-fp rows pass through novel=true with
    # n_seen NULL (no state snapshot applies to them).
    matched = (stream.where(F.col(fp_col).isNotNull())
               .groupBy(key_col)
               .applyInPandasWithState(
                   suppress, NEARDUP_OUT_SCHEMA, "fps array<long>",
                   "append", GroupStateTimeout.NoTimeout))
    passthrough = (stream.where(F.col(fp_col).isNull())
                   .select(F.col("clip_id"),
                           F.col(key_col).alias("block_key"),
                           F.col(fp_col).cast("bigint").alias("fp"),
                           F.lit(True).alias("novel"),
                           F.lit(None).cast("int").alias("n_seen")))
    return matched.unionByName(passthrough)


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
