"""SparkSession factory with the engine's tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = "record_dedup_spark", master: str | None = None,
                  shuffle_partitions: int | None = None,
                  extra: dict[str, str] | None = None) -> SparkSession:
    """local[N] for tests/bench; on a real cluster pass master=None and
    let spark-submit own it — when spark-submit has already configured
    `spark.master` (visible via SparkConf before any session exists),
    NO local default is applied, so `--master yarn/k8s` is never
    silently overridden into single-node local mode. Shuffle
    partitions default to the local core count in local mode (the 200
    default over-parallelizes small data and under-parallelizes
    100 TB); under a cluster master they are left to the submit conf —
    size explicitly per deployment."""
    from pyspark import SparkConf

    cores = os.cpu_count() or 8
    if master is None:
        # spark-submit materializes its --master/--conf as JVM system
        # properties that a fresh SparkConf() reads
        submitted = SparkConf().get("spark.master", None)
        master = os.environ.get(
            "SPARK_GRAFT_MASTER",
            None if submitted else
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', cores)}]")
    if (shuffle_partitions is None and master is not None
            and master.startswith("local")):
        # local[N] / local[N,maxFailures] / local[*] / bare "local".
        # ONLY local masters get a derived default: a cluster master
        # (spark://, yarn, k8s — incl. via SPARK_GRAFT_MASTER) must not
        # have its shuffle width pinned to THIS driver machine's core
        # count; it is left to the submit conf as documented.
        n = (master.split("[")[-1].rstrip("]").split(",")[0]
             if "[" in master else "1")
        shuffle_partitions = cores if n == "*" else max(int(n), 4)
    b = SparkSession.builder.appName(app)
    if master is not None:
        b = b.master(master)
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions",
                     str(shuffle_partitions))
    b = (b
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
         .config("spark.ui.enabled", "false")
         # Arrow batch sizing is driven by the WIDE rows: a 2048-row
         # batch of 64-200 KB audio payloads is 100s of MB in flight PER
         # TASK (x32 tasks = several GB buffered in one local JVM -> GC
         # collapse; on a cluster it's the same pathology per executor).
         # 128 rows keeps binary batches ~10-25 MB while costing
         # string-only UDF stages <1% in per-batch overhead.
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
         # Parquet vectorized-reader batches are sized in ROWS (4096
         # default): with wide binary payloads that is a ~GB-scale
         # on-heap columnar batch PER TASK — at 32 concurrent tasks the
         # G1 humongous-allocation storm collapses the whole JVM
         # (measured 10x slowdown). 64 rows keeps binary scan batches
         # ~4-12 MB; costs <1% on narrow all-scalar scans locally.
         .config("spark.sql.parquet.columnarReaderBatchSize", "64")
         # 32 MB G1 regions raise the humongous-allocation threshold to
         # 16 MB so the (bounded) columnar/Arrow batches above allocate
         # on the normal fast path. -Xss16m: codegen'd predicate
         # evaluation (split into chained helper methods) can nest
         # thousands of frames; local-mode task threads inherit this
         # default (set spark.executor.extraJavaOptions too on a real
         # cluster).
         .config("spark.driver.extraJavaOptions",
                 "-XX:G1HeapRegionSize=32m -Xss16m")
         # above the default threshold (10) an In-predicate is pushed to
         # parquet only as a [min,max] range — useless for scattered
         # clip_ids. The audio payload fetch relies on a real In filter
         # for row-group skipping (verify_audio), so raise it.
         .config("spark.sql.parquet.pushdown.inFilterThreshold", "10000")
         # split parquet scans finer than the 128m default: the
         # signature pass is CPU-bound per byte, so scan-parallelism is
         # worth more than fewer tasks (at 100 TB there are plenty of
         # files; locally this splits single-file corpora by row group).
         # 64m, not 16m: 16m turned a multi-GB corpus into ~500 splits
         # whose per-task overhead was re-paid by every pass over the
         # payload (measured flat scaling in the verify stage); 64m
         # still yields ~2x-core task counts at bench sizes
         .config("spark.sql.files.maxPartitionBytes", "64m"))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
