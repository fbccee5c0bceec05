"""Distributed connected components over the dup-edge list.

Replaces the reference's single-node union-find (G1,
/root/reference/src/core/openai_deduplicator.py:126-172) and its
DBSCAN clustering (C4, /root/reference/src/core/clustering_engine.py:348-352)
with the alternating **large-star / small-star** algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond";
load-balancing refinement in the BTS paper, PAPERS.md) — O(log^2 n)
rounds regardless of component diameter, no node ever accumulates a
whole component (the hash-to-min failure mode at 10^12 scale).

Implementation is pure DataFrame ops: groupBy-min + self-join per
round; `localCheckpoint` every cfg.cc_checkpoint_every rounds
truncates lineage (on a real cluster, use `spark.sparkContext.
setCheckpointDir` + `checkpoint()` for executor-fault tolerance).

Vertex ids are strings; min is lexicographic — deterministic and
total, no synthetic numeric ids needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DedupConfig, DEFAULT_CONFIG
from ..functions.localrel import local_rows_df


def _sym(e: DataFrame) -> DataFrame:
    return e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _large_star(e: DataFrame) -> DataFrame:
    """For each u: connect strictly larger neighbors to min(Γ(u) ∪ {u})."""
    sym = _sym(e)
    mins = (sym.groupBy("src")
            .agg(F.min("dst").alias("mn"))
            .select("src", F.least("mn", F.col("src")).alias("m")))
    return (sym.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges high->low; per node connect all smaller neighbors
    (and itself) to the minimum neighbor."""
    o = e.select(F.greatest("src", "dst").alias("src"),
                 F.least("src", "dst").alias("dst"))
    mins = o.groupBy("src").agg(F.min("dst").alias("m"))
    nbrs = (o.join(mins, "src")
            .where(F.col("dst") != F.col("m"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst")))
    selfe = mins.select("src", F.col("m").alias("dst"))
    return (nbrs.unionByName(selfe)
            .where(F.col("src") != F.col("dst"))
            .distinct())


def _checksum(e: DataFrame) -> tuple[int, int]:
    row = (e.agg(F.count(F.lit(1)).alias("n"),
                 F.coalesce(F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
                            F.lit(0).cast("decimal(38,0)")).alias("h"))
           .collect()[0])
    return int(row["n"]), int(row["h"])


def uf_find(parent: dict, x: str) -> str:
    """Path-compressed find. Root = lexicographic min member, the
    engine-wide canonical component representative (see uf_union)."""
    r = x
    while parent[r] != r:
        r = parent[r]
    while parent[x] != r:  # path compression
        parent[x], x = r, parent[x]
    return r


def uf_union(parent: dict, a: str, b: str) -> None:
    """Union by lexicographic min: the smaller root wins, so the final
    root of every component is its min member — the SAME canonical
    representative the distributed star algorithm converges to. Shared
    by the CC small-graph path and the subdivision driver ladder so
    the two driver union-finds cannot drift apart."""
    if a not in parent:
        parent[a] = a
    if b not in parent:
        parent[b] = b
    ra, rb = uf_find(parent, a), uf_find(parent, b)
    if ra != rb:
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra


def _driver_union_find(e: DataFrame) -> DataFrame:
    """Small-graph fast path: ONE collect + path-compressed union-find
    on the driver (literally the reference's G1 algorithm,
    /root/reference/src/core/openai_deduplicator.py:126-172 semantics).
    Crossing cfg.cc_driver_max_edges routes to the distributed star
    algorithm instead.

    Driver-memory contract: the collect costs ~515 B/edge Python-side
    (measured: 10M Rows of two 13-char string ids = 4.8 GB + 0.36 GB
    union-find dict — see test_driver_max_edges_budget), so the
    2M-edge default budgets ~1 GB. Size cc_driver_max_edges to
    (driver_heap_bytes / ~520) with headroom, not to what 'feels
    small'."""
    spark = e.sparkSession
    parent: dict[str, str] = {}

    # one collect, one job (toLocalIterator would run one job per
    # partition — 32 scheduler round-trips for a table that fits in a
    # single driver batch by the cc_driver_max_edges contract)
    for src, dst in e.collect():
        uf_union(parent, src, dst)
    import pandas as pd
    keys = list(parent)
    pdf = pd.DataFrame({"clip_id": keys,
                        "component": [uf_find(parent, x) for x in keys]})
    # Arrow-path createDataFrame: the plain-list overload pickles row by
    # row through py4j (seconds for ~10^5 rows); the pandas overload
    # ships one Arrow batch.
    return spark.createDataFrame(pdf)


def connected_components(edges: DataFrame, cfg: DedupConfig = DEFAULT_CONFIG) -> DataFrame:
    """edges(id_1, id_2) -> (clip_id, component) for every vertex that
    appears in an edge; component = lexicographic min clip_id of the
    component (deterministic canonical representative, the reference's
    min-id survivor rule at openai_deduplicator.py:174-218)."""
    e = (edges.select(F.col("id_1").alias("src"), F.col("id_2").alias("dst"))
         .where(F.col("src") != F.col("dst"))
         .distinct()
         .localCheckpoint(eager=True))  # cut upstream lineage before iterating
    n_edges = e.count()
    if n_edges == 0:
        return e.select(F.col("src").alias("clip_id"), F.col("dst").alias("component")).limit(0)
    if n_edges <= cfg.cc_driver_max_edges:
        return _driver_union_find(e)

    prev = None
    converged = False
    every = max(1, cfg.cc_checkpoint_every)
    for it in range(cfg.cc_max_iters):
        e = _small_star(_large_star(e))
        # truncate lineage every cc_checkpoint_every rounds (the
        # checksum action below executes the plan either way; without
        # periodic truncation the chain-of-rounds lineage re-executes
        # from the original edge scan on every later action)
        if (it + 1) % every == 0:
            e = e.localCheckpoint(eager=True)
        cur = _checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components: star loop did not converge in "
            f"cc_max_iters={cfg.cc_max_iters} rounds — the result would "
            f"be a silently wrong partition (children still pointing at "
            f"non-root intermediates). Raise cc_max_iters; alternating "
            f"large-star/small-star needs O(log^2 n) rounds.")
    if (it + 1) % every != 0:
        e = e.localCheckpoint(eager=True)  # materialize before the final reads

    # converged: e is a star forest (child -> root)
    children = e.select(F.col("src").alias("clip_id"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("clip_id"), F.col("dst").alias("component")).distinct()
    return children.unionByName(roots).distinct()


def key_cocluster_edges(records: DataFrame, key_col: str,
                        cfg: DedupConfig = DEFAULT_CONFIG,
                        id_col: str = "clip_id") -> DataFrame:
    """C11 domain-first clustering, Spark-first: records sharing a
    non-null exact key must ALWAYS co-cluster. The reference
    approximates this with feature-space boosting and sentinel values
    inside its subdivision engine
    (/root/reference/src/core/clustering/hierarchical/subdivision_engine_v3.py:15-238);
    here it degenerates — as SURVEY §2.6 predicted — to connectivity
    edges per key group, generated by the same skew-safe tiered pairer
    the blocking stage uses (full pairs for small key groups, salted
    chains + representative stitching for hot keys: LINEAR edges,
    bounded task width). Union the result with the verified dup edges
    before `connected_components` and CC guarantees the per-key
    co-clustering by construction.

    Returns (id_1, id_2)."""
    from .blocking import pairs_within_blocks

    # block on the RAW key value, not a hash: these edges are hard
    # merge constraints that nothing re-verifies downstream, so a
    # 64-bit hash collision (birthday bound ~2.7% that SOME collision
    # exists at 10^9 distinct keys) would force-merge two unrelated
    # key groups irreversibly. pairs_within_blocks only groups/joins
    # on bkey — dtype is free, so equality is exact by construction.
    members = (records
               .where(F.col(key_col).isNotNull() & (F.col(key_col) != ""))
               .select(F.col(id_col).alias("clip_id"),
                       F.lit("key").alias("source"),
                       F.col(key_col).cast("string").alias("bkey")))
    return (pairs_within_blocks(members, cfg, materialize=False)
            .select("id_1", "id_2").distinct())


def assign_clusters(all_ids: DataFrame, components: DataFrame,
                    cfg: DedupConfig = DEFAULT_CONFIG,
                    densify: bool = False) -> DataFrame:
    """Left-join components onto the full id table (C15-analog,
    /root/reference/src/core/clustering_engine.py:553-570).

    Default contract (the scale path): ``cluster_id`` is the STRING
    component representative (lexicographic-min member id — already
    deterministic and canonical); vertices in no dup edge (noise,
    reference -1 convention at clustering_engine.py:527-529) get NULL.
    No global ordering anywhere in the plan.

    ``densify=True`` (reporting opt-in): dense LongType ids 0..k-1 and
    noise label ``cfg.noise_label``, assigned by two-phase
    partition-offset numbering — row_number within hash partitions of
    the distinct representative list plus collected per-partition
    offsets (one tiny collect of #partitions rows). No single-partition
    global window at any component count."""
    assigned = (all_ids.select("clip_id")
                .join(components, "clip_id", "left")
                .withColumnRenamed("component", "cluster_id"))
    if not densify:
        return assigned

    spark = all_ids.sparkSession
    n = max(spark.sparkContext.defaultParallelism, 1)
    reps = (components.select("component").distinct()
            .repartition(n, "component")
            .withColumn("pid", F.spark_partition_id()))
    sizes = {int(r.pid): int(r.c)
             for r in reps.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_df = local_rows_df(
        spark, [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
        "pid int, offset long")
    comp_ids = (reps.withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("pid").orderBy("component")) - 1)
        .join(F.broadcast(off_df), "pid")
        .select("component", (F.col("rn") + F.col("offset")).alias("dense_id")))
    return (assigned
            .join(comp_ids, assigned["cluster_id"] == comp_ids["component"], "left")
            .select("clip_id",
                    F.coalesce("dense_id", F.lit(cfg.noise_label)).alias("cluster_id")))
