"""Structured-Streaming dedup smoke (availableNow trigger drives the
stream to completion over static files)."""

import os
import shutil

from record_deduplication_spark.datagen import generate_clips
from record_deduplication_spark.streaming.dedup_stream import run_batchwise


def test_streaming_exact_dedup(spark, tmpdir_session):
    base = os.path.join(tmpdir_session, "stream")
    in_dir, out_dir, ckpt = (os.path.join(base, d) for d in ("in", "out", "ckpt"))
    os.makedirs(in_dir, exist_ok=True)

    clips, _ = generate_clips(n_clips=60, seed=9)
    # write two micro-batch files; duplicate the first 10 rows in file 2
    clips.iloc[:40].to_parquet(os.path.join(in_dir, "part1.parquet"), index=False)
    dup = clips.iloc[:10].copy()
    dup["clip_id"] = ["dup_" + c for c in dup["clip_id"]]  # same payload, new ids
    import pandas as pd
    pd.concat([clips.iloc[40:], dup]).to_parquet(
        os.path.join(in_dir, "part2.parquet"), index=False)

    run_batchwise(spark, in_dir, out_dir, ckpt)
    out = spark.read.parquet(out_dir)
    n = out.count()
    # 60 unique payload+transcript keys among the originals (datagen
    # plants exact dups itself, so compute the expected key count)
    import hashlib
    keys = {(hashlib.sha256(b).hexdigest(), t)
            for b, t in zip(clips["bytes"], clips["transcript"])}
    assert n == len(keys), f"stream kept {n}, expected {len(keys)} unique keys"
    shutil.rmtree(base, ignore_errors=True)


def test_streaming_late_data_watermark(spark, tmpdir_session):
    """Watermark contract over EVENT time: an event older than the
    watermark horizon is DROPPED from its (already finalized) window;
    a late event still within the horizon is KEPT and counted when its
    window finalizes. Three single-file micro-batches drive the
    watermark forward deterministically (mtime-ordered)."""
    import time as _time
    from datetime import datetime

    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from record_deduplication_spark.streaming.dedup_stream import (
        windowed_event_counts)

    base = os.path.join(tmpdir_session, "stream_late")
    in_dir, out_dir, ckpt = (os.path.join(base, d) for d in ("in", "out", "ckpt"))
    os.makedirs(in_dir, exist_ok=True)

    def ts(minute, second=0):
        return datetime(2026, 1, 1, 10, minute, second)

    # batch A: 3 on-time events in W1[10:00,10:10) + pusher at 10:30
    #   -> watermark after A = 10:25 (> W1 end): W1 finalizes next batch
    a = pd.DataFrame({"ts": [ts(1), ts(3), ts(5), ts(30)],
                      "event_type": ["a", "a", "a", "push"],
                      "value": [1.0, 1.0, 1.0, 0.0]})
    # batch B: too-late event at 10:02 (W1, ts < watermark AND window
    # closed -> dropped); in-horizon late event at 10:24 (ts < water-
    # mark but W2[10:20,10:30) still open -> kept); pusher at 10:38
    #   -> watermark after B = 10:33 (> W2 end)
    b = pd.DataFrame({"ts": [ts(2), ts(24), ts(38)],
                      "event_type": ["a", "a", "push"],
                      "value": [99.0, 5.0, 0.0]})
    # batch C: pusher only — triggers emission of W2
    c = pd.DataFrame({"ts": [ts(45)], "event_type": ["push"], "value": [0.0]})

    _ = _time  # batch order is driven by restarts, not mtimes
    schema = T.StructType([T.StructField("ts", T.TimestampType()),
                           T.StructField("event_type", T.StringType()),
                           T.StructField("value", T.DoubleType())])
    # one availableNow run PER file: each restart recovers the
    # watermark from the checkpoint, so batch boundaries (and the
    # watermark advance between them) are deterministic — and stream
    # state recovery is exercised for free
    for i, pdf in enumerate((a, b, c)):
        pdf.to_parquet(os.path.join(in_dir, f"f{i}.parquet"), index=False,
                       coerce_timestamps="us", allow_truncated_timestamps=True)
        stream = (spark.readStream.schema(schema).parquet(in_dir))
        q = (windowed_event_counts(stream, ts_col="ts", window="10 minutes",
                                   watermark="5 minutes")
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()

    out = spark.read.parquet(out_dir).where(F.col("event_type") == "a").toPandas()
    got = {r.win_start.minute: (int(r.n_events), float(r.total_value))
           for r in out.itertuples()}
    # W1: the 10:02 straggler was dropped -> 3 events, not 4 (and not
    # value 102.0)
    assert got.get(0) == (3, 3.0), got
    # W2: the in-horizon late 10:24 event WAS counted
    assert got.get(20) == (1, 5.0), got
    shutil.rmtree(base, ignore_errors=True)


def test_stateful_near_dup_suppression(spark, tmpdir_session):
    """applyInPandasWithState custom operator: fingerprints seen in an
    EARLIER micro-batch (and earlier runs — state recovers from the
    checkpoint across restarts) suppress near-dups (Hamming <= k) in
    later batches, while distant fingerprints stay novel."""
    import pandas as pd
    from pyspark.sql import types as T
    from record_deduplication_spark.streaming.dedup_stream import (
        near_dup_suppress_stream)

    base = os.path.join(tmpdir_session, "stream_state")
    in_dir, out_dir, ckpt = (os.path.join(base, d) for d in ("in", "out", "ckpt"))
    os.makedirs(in_dir, exist_ok=True)

    # batch 1: block A seeds fp=0; block B seeds fp=0xFFFF
    b1 = pd.DataFrame({"clip_id": ["a1", "b1"],
                       "block_key": ["A", "B"],
                       "fp": [0, 0xFFFF]})
    # batch 2: a2 is Hamming-2 from a1's fp (near-dup -> suppressed),
    # a3 is Hamming-8 (novel); b2 exactly repeats b1's fp (suppressed)
    b2 = pd.DataFrame({"clip_id": ["a2", "a3", "b2"],
                       "block_key": ["A", "A", "B"],
                       "fp": [0b11, 0b11111111, 0xFFFF]})
    schema = T.StructType([T.StructField("clip_id", T.StringType()),
                           T.StructField("block_key", T.StringType()),
                           T.StructField("fp", T.LongType())])
    for i, pdf in enumerate((b1, b2)):
        pdf.to_parquet(os.path.join(in_dir, f"f{i}.parquet"), index=False)
        q = (near_dup_suppress_stream(
                spark.readStream.schema(schema).parquet(in_dir), hamming_k=3)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()

    out = spark.read.parquet(out_dir).toPandas().set_index("clip_id")
    assert out.loc["a1", "novel"] and out.loc["b1", "novel"]
    assert not out.loc["a2", "novel"]      # within Hamming-3 of a1, cross-batch
    assert out.loc["a3", "novel"]          # Hamming-8: genuinely new
    assert not out.loc["b2", "novel"]      # exact repeat in another block
    assert int(out.loc["a3", "n_seen"]) == 2
    shutil.rmtree(base, ignore_errors=True)


def test_popcount_lut_equivalence():
    """The vectorized byte-LUT Hamming scan in near_dup_suppress_stream
    must equal the definitional 64-bit popcount for the FULL int64
    range, including negative fingerprints (where the r2 scalar path's
    bin() counted magnitude bits, not two's-complement)."""
    import numpy as np

    pop = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    rng = np.random.default_rng(7)
    seen = rng.integers(-2**63, 2**63, 64, dtype=np.int64).view(np.uint64)
    for fp in rng.integers(-2**63, 2**63, 100, dtype=np.int64):
        x = np.bitwise_xor(seen, fp.astype(np.uint64))
        d_vec = pop[x.view(np.uint8)].reshape(x.size, 8).sum(axis=1)
        f = int(fp) & (2**64 - 1)
        d_ref = [bin(f ^ int(s)).count("1") for s in seen.tolist()]
        assert d_vec.tolist() == d_ref


def test_native_session_window_agrees_with_manual_sessionization(spark):
    """Spark's native session_window(ts, gap) must produce the same
    (user, n_events, session_start) sets as the manual lag +
    cumulative-sum builder that the event_sessionization gate hash-
    checks against DuckDB — tying the streaming-native operator to the
    SQL-oracle-verified semantics."""
    from pyspark.sql import functions as F

    from record_deduplication_spark.analysis import gate_queries as G

    sf = "/root/testdata/sf0.001"
    G.register_views(spark, sf)
    manual = (spark.sql(G.PAIRED_SQL["event_sessionization"][0])
              .select("user_id", "n_events", "start_us").toPandas())
    ev = spark.table("events")
    native = (ev.groupBy(F.session_window(F.col("ts").cast("timestamp"),
                                          "30 minutes").alias("w"), "user_id")
              .agg(F.count(F.lit(1)).alias("n_events"))
              .select("user_id", "n_events",
                      F.unix_micros("w.start").alias("start_us"))
              .toPandas())
    key = lambda d: sorted(map(tuple, d[["user_id", "n_events",  # noqa: E731
                                         "start_us"]].to_numpy()))
    assert key(manual) == key(native)


def test_streaming_sliding_window_append(spark, tmpdir_session):
    """Sliding windows under a watermark in true streaming append mode:
    one event lands in BOTH of its 10-min/5-min-hop windows, each
    emitted exactly once when the watermark passes its end."""
    from datetime import datetime

    import pandas as pd
    from pyspark.sql import types as T

    from record_deduplication_spark.streaming.dedup_stream import (
        windowed_event_counts)

    base = os.path.join(tmpdir_session, "stream_slide")
    in_dir, out_dir, ckpt = (os.path.join(base, d) for d in ("in", "out", "ckpt"))
    os.makedirs(in_dir, exist_ok=True)

    def ts(minute, second=0):
        return datetime(2026, 1, 1, 12, minute, second)

    a = pd.DataFrame({"ts": [ts(7)], "event_type": ["a"], "value": [2.0]})
    push = pd.DataFrame({"ts": [ts(59)], "event_type": ["push"], "value": [0.0]})
    schema = T.StructType([T.StructField("ts", T.TimestampType()),
                           T.StructField("event_type", T.StringType()),
                           T.StructField("value", T.DoubleType())])
    for i, pdf in enumerate((a, push)):
        pdf.to_parquet(os.path.join(in_dir, f"f{i}.parquet"), index=False,
                       coerce_timestamps="us", allow_truncated_timestamps=True)
        q = (windowed_event_counts(
                spark.readStream.schema(schema).parquet(in_dir),
                ts_col="ts", window="10 minutes", watermark="5 minutes",
                slide="5 minutes")
             .writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt).outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()

    out = (spark.read.parquet(out_dir)
           .where("event_type = 'a'").toPandas())
    starts = sorted(r.minute for r in out["win_start"])
    # 12:07 belongs to [12:00,12:10) and [12:05,12:15): both finalized
    assert starts == [0, 5], starts
    assert (out["n_events"] == 1).all() and (out["total_value"] == 2.0).all()
    shutil.rmtree(base, ignore_errors=True)
