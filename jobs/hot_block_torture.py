"""Hot-block torture bench (VERDICT r4 #3).

Plants ONE degenerate block of >=10^5 members sharing a block key —
the shape that kills naive blocking at 10^12 scale (a popular LSH band
/ boilerplate transcript) — and measures, empirically at bench scale:

  * wall-time and pair count of the tiered pairer on the hot block;
  * per-task width: the largest salt sub-block the window pass
    actually processes (the bounded-task-width guarantee);
  * the un-salted counterfactual: C(n,2) pairs in ONE window task,
    estimated from the measured per-pair throughput of the full-pairing
    tier on a block sized to fit.

Writes BENCH/hot_block_torture.json; the headline numbers go into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from record_deduplication_spark.config import DEFAULT_CONFIG, DedupConfig  # noqa: E402
from record_deduplication_spark.operators.blocking import pairs_within_blocks  # noqa: E402
from record_deduplication_spark.session import build_session  # noqa: E402


def main(n_hot: int = 100_000, n_bg_blocks: int = 2_000,
         bg_size: int = 20, cpus: int = 16) -> None:
    cfg = DEFAULT_CONFIG
    spark = build_session(app="hot_block_torture", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)

    hot = (spark.range(n_hot)
           .select(F.format_string("h%08d", "id").alias("clip_id"),
                   F.lit("lsh").alias("source"),
                   F.lit(7).cast("long").alias("bkey")))
    bg = (spark.range(n_bg_blocks * bg_size)
          .select(F.format_string("b%08d", "id").alias("clip_id"),
                  F.lit("lsh").alias("source"),
                  (F.lit(1000) + F.col("id") % n_bg_blocks).alias("bkey")))
    members = hot.unionByName(bg).localCheckpoint(eager=True)

    # --- the salted tiered pairer on the degenerate block ---
    t0 = time.time()
    n_pairs = pairs_within_blocks(members, cfg).count()
    salted_sec = time.time() - t0
    hot_pair_bound = n_hot * (cfg.hot_block_neighbor_w + 1)
    bg_pairs = n_bg_blocks * bg_size * (bg_size - 1) // 2

    # --- measured per-task width (largest salt sub-block) ---
    n_salts = -(-n_hot // cfg.hot_block_salt_target)
    widths = (hot
              .withColumn("salt", F.pmod(F.xxhash64("clip_id"), F.lit(n_salts)))
              .groupBy("salt").count()
              .agg(F.max("count").alias("mx"), F.min("count").alias("mn"),
                   F.count(F.lit(1)).alias("n")).collect()[0])

    # --- counterfactual: un-salted full pairing of the whole block ---
    # Measure the full-pairing tier's per-pair cost on a block that
    # fits (m=4000 -> 8M pairs through collect_list + pair-explode in
    # ONE task, exactly what an un-salted hot block would do), then
    # scale to C(n_hot, 2). This UNDERSTATES the true cost: the single
    # collect_list over 10^5 ids also risks reducer OOM, which no
    # extrapolation can price in.
    m = 4_000
    probe = (spark.range(m)
             .select(F.format_string("p%08d", "id").alias("clip_id"),
                     F.lit("lsh").alias("source"),
                     F.lit(9).cast("long").alias("bkey")))
    probe_cfg = DedupConfig(max_block_full_pairs=m)
    t0 = time.time()
    probe_pairs = pairs_within_blocks(probe, probe_cfg).count()
    probe_sec = time.time() - t0
    assert probe_pairs == m * (m - 1) // 2
    full_pairs = n_hot * (n_hot - 1) // 2
    est_unsalted_sec = probe_sec * full_pairs / probe_pairs

    result = {
        "metric": "hot_block_torture",
        "n_hot_members": n_hot,
        "background_blocks": {"n": n_bg_blocks, "size": bg_size},
        "config": {"max_block_full_pairs": cfg.max_block_full_pairs,
                   "hot_block_neighbor_w": cfg.hot_block_neighbor_w,
                   "hot_block_salt_target": cfg.hot_block_salt_target},
        "salted": {
            "wall_sec": round(salted_sec, 2),
            "pairs_total": n_pairs,
            "pairs_hot_block": n_pairs - bg_pairs,
            "hot_pair_linear_bound": hot_pair_bound,
            "n_salt_subblocks": int(widths.n),
            "per_task_width_max": int(widths.mx),
            "per_task_width_min": int(widths.mn),
        },
        "unsalted_counterfactual": {
            "pairs": full_pairs,
            "est_wall_sec": round(est_unsalted_sec, 1),
            "est_basis": {"probe_block_members": m,
                          "probe_pairs": probe_pairs,
                          "probe_sec": round(probe_sec, 2)},
            "note": ("single window task holding all members; estimate "
                     "scales measured full-pairing throughput linearly — "
                     "a lower bound (one-reducer collect_list of 1e5 ids "
                     "adds memory pressure no extrapolation prices in)"),
        },
        "pair_reduction_vs_unsalted": round(full_pairs / max(1, n_pairs - bg_pairs)),
        "speedup_vs_unsalted_est": round(est_unsalted_sec / salted_sec, 1),
        "cpus": cpus,
    }
    # the contract the bench exists to prove, asserted on the measured run
    assert n_pairs - bg_pairs <= hot_pair_bound, result
    assert widths.mx <= 3 * cfg.hot_block_salt_target, result

    print(json.dumps(result))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "hot_block_torture.json"), "w") as f:
        json.dump(result, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main(n_hot=int(sys.argv[1]) if len(sys.argv) > 1 else 100_000,
         cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
