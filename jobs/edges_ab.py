"""Interleaved A/B of the edges stage at 48k clips on pinned 8 cores:
variant 'chk' is the current code (verify_text mid-stage checkpoint ON),
'nochk' disables it via SPARK_GRAFT_VERIFY_TEXT_NO_CHECKPOINT. One child
process per rep (taskset-pinned, fresh JVM); signed+candidates are
computed once into a shared workdir, each rep drops edges+clusters and
times only their rebuild via the metrics table.

Round-4 verdict (3 interleaved pairs, taskset 0-7): chk won every
matched pair — 26.2 vs 117.4, 25.4 vs 30.3, 36.6 vs 56.4 s — so the
checkpoint stays (a 2k-clip e2e measurement had said the opposite;
scale flipped it, see operators/verify.py).

Usage:
  python jobs/edges_ab.py prepare <workdir> <n_clips>
  python jobs/edges_ab.py rep <workdir> <n_clips> <chk|nochk>
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _session(cores=8):
    from record_deduplication_spark.session import build_session
    return build_session(app="edges_ab", master=f"local[{cores}]",
                         shuffle_partitions=cores * 2,
                         extra={"spark.driver.memory": "16g"})


def _clips(spark, n):
    import bench
    d = bench._corpus_dir(n, dur_min_ms=bench.SCALING_DUR[0],
                          dur_max_ms=bench.SCALING_DUR[1], sharded=True)
    return spark.read.parquet(os.path.join(d, "clips.parquet"))


def prepare(workdir, n):
    from record_deduplication_spark.plans.pipeline import DedupPipeline
    spark = _session()
    pipe = DedupPipeline(spark, workdir)
    clips = _clips(spark, n)
    pipe.run(clips, resume=True)
    print("prepared", pipe.store.metrics().toPandas()
          .groupby("stage")["duration_s"].min().to_dict())


def rep(workdir, n, variant):
    # a typo'd variant must never record a mislabeled timing — these
    # matched pairs are the evidence behind keeping the checkpoint
    if variant not in ("chk", "nochk"):
        raise SystemExit(f"unknown variant {variant!r}: use chk|nochk")
    os.environ["SPARK_GRAFT_VERIFY_TEXT_NO_CHECKPOINT"] = \
        "0" if variant == "chk" else "1"
    from record_deduplication_spark.plans.pipeline import DedupPipeline
    spark = _session()
    pipe = DedupPipeline(spark, workdir)
    pipe.store.drop("edges")
    pipe.store.drop("clusters")
    clips = _clips(spark, n)
    pipe.run(clips, resume=True)
    m = pipe.store.metrics().toPandas()
    last = m[m.stage == "edges"].sort_values("run_id").iloc[-1]
    print(json.dumps({"variant": variant,
                      "edges_sec": float(last.duration_s)}))


if __name__ == "__main__":
    cmd, wd, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    if cmd == "prepare":
        prepare(wd, n)
    elif cmd == "rep":
        rep(wd, n, sys.argv[4])
    else:
        raise SystemExit(f"unknown command {cmd!r}: use prepare|rep "
                         f"(see module docstring)")
