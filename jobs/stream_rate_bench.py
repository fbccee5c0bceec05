"""Streaming near-dup suppression rate/scale micro-bench (VERDICT r4 #5).

Drives `near_dup_suppress_stream` (applyInPandasWithState) over 10k
rows split into parquet micro-batches and reports sustained rows/s,
per-micro-batch latency, suppression stats, and the final state-store
footprint (fingerprints retained per block key — the operator's
hard-bounded state contract). Writes BENCH/streaming_rate.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from record_deduplication_spark.session import build_session  # noqa: E402
from record_deduplication_spark.streaming.dedup_stream import (  # noqa: E402
    near_dup_suppress_stream)


def _corpus(n_rows: int, n_keys: int, seed: int = 11) -> pd.DataFrame:
    """Mixed stream: ~half near-dups of earlier fingerprints within
    their block (Hamming <= 3 of a per-key base), ~half novel."""
    rng = np.random.default_rng(seed)
    base = rng.integers(-2**62, 2**62, n_keys, dtype=np.int64)
    rows = []
    for i in range(n_rows):
        k = int(rng.integers(0, n_keys))
        if rng.random() < 0.5:
            fp = int(base[k])
            for b in rng.integers(0, 64, int(rng.integers(0, 3))):
                fp ^= 1 << int(b)  # <=2 bit flips: near-dup of base
            # two's-complement wrap back into int64 (Python XOR on
            # negative ints sign-extends infinitely in both directions)
            fp = ((fp + (1 << 63)) % (1 << 64)) - (1 << 63)
        else:
            fp = int(rng.integers(-2**62, 2**62))
        rows.append((f"clip{i:06d}", f"blk{k:04d}", np.int64(fp)))
    return pd.DataFrame(rows, columns=["clip_id", "block_key", "fp"])


def main(n_rows: int = 10_000, n_keys: int = 16, n_batches: int = 10,
         max_state_fps: int = 256, cpus: int = 8) -> None:
    spark = build_session(app="stream_rate", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
    base = tempfile.mkdtemp(prefix="stream_rate_")
    in_dir, out_dir, ckpt = (os.path.join(base, d) for d in ("in", "out", "ck"))
    os.makedirs(in_dir)
    pdf = _corpus(n_rows, n_keys)
    per = n_rows // n_batches

    batch_secs = []
    t_all = time.time()
    # one availableNow run PER file, the file written right before its
    # run (availableNow drains EVERYTHING already present, so
    # pre-writing all files would fold the whole corpus into run 1):
    # each run recovers state from the checkpoint, so per-micro-batch
    # latency is measured INCLUDING the state round-trip (the cost
    # that grows if state is unbounded)
    batch_rows = []
    for i in range(n_batches):
        # last batch takes the remainder so every row is written even
        # when n_rows is not divisible by n_batches
        hi = n_rows if i == n_batches - 1 else (i + 1) * per
        batch_rows.append(hi - i * per)
        pdf.iloc[i * per:hi].to_parquet(
            os.path.join(in_dir, f"b{i:03d}.parquet"), index=False)
        stream = (spark.readStream
                  .schema("clip_id string, block_key string, fp long")
                  .parquet(in_dir))
        t0 = time.time()
        q = (near_dup_suppress_stream(stream, hamming_k=3,
                                      max_state_fps=max_state_fps)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        batch_secs.append(round(time.time() - t0, 2))
    wall = time.time() - t_all

    out = spark.read.parquet(out_dir).toPandas()
    assert len(out) == n_rows, (len(out), n_rows)
    state_per_key = out.groupby("block_key")["n_seen"].max().clip(upper=max_state_fps)
    # rate per batch from that batch's OWN row count (the last batch
    # carries the remainder; dividing by the uniform `per` would
    # misreport it whenever it is the fastest)
    rates = [n / t for n, t in zip(batch_rows, batch_secs)]
    steady = sorted(rates[2:], reverse=True) if len(rates) > 4 \
        else sorted(rates, reverse=True)
    result = {
        "metric": "stream_near_dup_suppression_rate",
        "n_rows": n_rows,
        "n_block_keys": n_keys,
        "n_micro_batches": n_batches,
        "rows_per_sec_overall": round(n_rows / wall, 1),
        "rows_per_sec_steady_batch_best": round(steady[0], 1),
        "batch_secs": batch_secs,
        "batch_note": ("each batch = one availableNow restart incl. "
                       "checkpoint state recovery; first batches carry "
                       "stream start-up"),
        "suppressed_rows": int((~out["novel"]).sum()),
        "novel_rows": int(out["novel"].sum()),
        "state": {
            "max_state_fps": max_state_fps,
            "final_entries_total": int(state_per_key.sum()),
            "final_entries_max_per_key": int(state_per_key.max()),
            "approx_bytes": int(state_per_key.sum()) * 8,
            "note": ("hard-bounded: <= max_state_fps int64 per block key "
                     "regardless of stream lifetime"),
        },
        "cpus": cpus,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH", "streaming_rate.json"), "w") as f:
        json.dump(result, f, indent=2)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(n_rows=int(sys.argv[1]) if len(sys.argv) > 1 else 10_000,
         cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
