"""Hierarchical subdivision of oversized clusters (C6-C13).

Reference analogs (SURVEY.md §2.6):

- C6 adaptive while-loop driver — while any cluster > max_size, with
  depth <= 20, wall-clock timeout and a no-progress break
  (/root/reference/src/core/clustering/hierarchical/adaptive_clusterer_v3.py:31-112).
- C8 SmartDBSCAN — progressive eps ladder [1, .7, .5, .3] with a
  0.8^depth depth factor
  (/root/reference/src/core/clustering/hierarchical/subdivision_engine_v3.py:357-445).
- C9 AggressivePCA — harsher ladder [.1, .05, .03, .01] * 0.5^depth for
  persistent clusters (size >= 500, depth >= 3)
  (subdivision_engine_v3.py:448-519).
- C7 FastKMeans — fit on a <= 5000-row sample, predict all members
  (subdivision_engine_v3.py:264-354).
- C10 Force — guaranteed-progress split, last resort
  (subdivision_engine_v3.py:522-598); also the ">10000 members or >70%
  of the time budget" fast path of the reference's strategy hint
  (adaptive_clusterer_v3.py:195-212).
- C13 adaptive depth threshold schedule — 30%/60%/100% progression
  (/root/reference/src/core/clustering/hierarchical/adaptive_threshold.py:16-71).

Spark-first shape
-----------------
The reference re-runs DBSCAN at ever-smaller eps inside each oversized
cluster. Our similarity-space analog re-runs **connected components
over the cluster's internal dup edges at progressively stricter score
thresholds** (an eps ladder in 1-score space) — similarity-aware
splitting with no geometric embedding needed. Two scale properties the
reference's per-cluster python loop lacks:

- every ladder rung processes ALL still-unsplit oversized clusters in
  ONE distributed job (edges are tagged with their cluster; components
  cannot cross clusters because only intra-cluster edges are kept);
- KMeans runs per-group inside `applyInPandas` (one distributed job
  for all oversized clusters, Arrow batches, fit-on-sample like the
  reference) instead of a serial driver-side fit per cluster.

Cluster-key contract: assignments are (clip_id, cluster_key STRING);
noise is NULL or "-1" (both conventions accepted, see
`operators.stats.clustered`). Sub-clusters get hierarchical keys
"<parent>.<min-member-id>" (ladder), "<parent>_k<bucket>" (kmeans) or
"<parent>_f<bucket>" (force) — deterministic, derived from member ids,
never from nondeterministic counters.
"""

from __future__ import annotations

import math
import time
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig, DEFAULT_CONFIG
from ..functions.localrel import local_rows_df
from .cc import connected_components
from .stats import clustered


# --------------------------------------------------------------------------
# C13: adaptive depth threshold schedule
# --------------------------------------------------------------------------

def adaptive_threshold(depth: int, base_threshold: float,
                       high_threshold: float) -> float:
    """Depth-staged similarity threshold (reference
    adaptive_threshold.py:16-71, exact semantics).

    `high_threshold` is the always-preserve level (connections at or
    below it are only cut at the deepest stages); `base_threshold` is
    the strictest eventual cut (base > high). The progression walks
    30% / 60% / 100% of the [high, base] range at 1-indexed depths
    <=2 / <=4 / >4."""
    depth_1 = depth + 1
    if depth_1 <= 2:
        factor = 0.3
    elif depth_1 <= 4:
        factor = 0.6
    else:
        factor = 1.0
    threshold = high_threshold + (base_threshold - high_threshold) * factor
    return max(threshold, high_threshold)


# --------------------------------------------------------------------------
# C8/C9: threshold ladders (eps ladders mapped to 1-score space)
# --------------------------------------------------------------------------

#: SmartDBSCAN eps multipliers (subdivision_engine_v3.py:410-415)
SMART_LADDER = (1.0, 0.7, 0.5, 0.3)
#: AggressivePCA eps multipliers (subdivision_engine_v3.py:488-490)
AGGRESSIVE_LADDER = (0.1, 0.05, 0.03, 0.01)


def ladder_thresholds(depth: int, start_threshold: float,
                      kind: str = "smart") -> list[float]:
    """Score thresholds for one subdivision attempt, strict-ascending.

    Maps the reference's eps ladders into similarity space via
    eps = (1 - start_threshold): rung_j = 1 - eps * f_j * decay^depth.
    `kind="smart"` uses factors [1, .7, .5, .3] with 0.8^depth decay
    (C8); `kind="aggressive"` uses [.1, .05, .03, .01] with 0.5^depth
    decay (C9)."""
    if kind == "smart":
        factors, decay = SMART_LADDER, 0.8
    elif kind == "aggressive":
        factors, decay = AGGRESSIVE_LADDER, 0.5
    else:
        raise ValueError(f"unknown ladder kind: {kind!r}")
    eps = max(1.0 - start_threshold, 0.0)
    out = []
    for f in factors:
        t = 1.0 - eps * f * (decay ** depth)
        out.append(min(max(t, 0.0), 1.0))
    return out


# --------------------------------------------------------------------------
# C8/C9 executor: threshold-ladder CC re-run (all clusters in one job/rung)
# --------------------------------------------------------------------------

def _norm_assign(clusters: DataFrame, cluster_col: str) -> DataFrame:
    return clusters.select(
        "clip_id", F.col(cluster_col).cast("string").alias("cluster_key"))


def _oversized_keys(assign: DataFrame, max_size: int) -> DataFrame:
    return (assign.where(clustered("cluster_key"))
            .groupBy("cluster_key").agg(F.count(F.lit(1)).alias("size"))
            .where(F.col("size") > max_size)
            .select("cluster_key"))


def _merge_assign(assign: DataFrame, new: DataFrame) -> DataFrame:
    """Apply sub-assignments (clip_id, new_key, _sub=true marker) onto
    the full assignment with ONE left join (constant plan depth
    regardless of how many clusters were split)."""
    return (assign.join(new, "clip_id", "left")
            .select("clip_id",
                    F.when(F.col("_sub") == F.lit(True), F.col("new_key"))
                     .otherwise(F.col("cluster_key")).alias("cluster_key")))


def _ladder_driver(assign: DataFrame, members: DataFrame, intra: DataFrame,
                   thresholds: Iterable[float],
                   singletons_to_noise: bool) -> DataFrame:
    """Small-graph ladder: one collect, all rungs driver-side.

    Semantics mirror the distributed loop exactly: per cluster, walk
    the rungs in order; at each rung, union-find over the cluster's
    edges with score >= t (root = lexicographic min clip_id via the
    SHARED operators/cc uf helpers); accept the first rung with >= 2
    components. NULL-score and self-loop edges are dropped, exactly as
    the distributed regime's `_score >= t` filter and cc's
    `src != dst` filter drop them. Members untouched at the accepted
    rung are singletons (noise or parent key). Clusters no rung splits
    are left out of the merge and keep their key."""
    from collections import defaultdict

    from .cc import uf_find, uf_union

    thresholds = list(thresholds)  # re-walked once PER CLUSTER: a
    # one-shot iterable would silently give every cluster after the
    # first zero rungs
    by_ck: dict[str, list] = defaultdict(list)
    for ck, i1, i2, s in intra.collect():
        # NULL score: `_score >= t` is NULL -> dropped distributed;
        # self-loop: dropped by cc's src != dst — match both here
        if s is not None and i1 != i2:
            by_ck[ck].append((i1, i2, s))

    accepted_rows: list[tuple[str, str]] = []   # (clip_id, new_key)
    accepted_keys: list[str] = []
    for ck, es in by_ck.items():
        for t in thresholds:
            parent: dict[str, str] = {}
            for i1, i2, s in es:
                if s >= t:
                    uf_union(parent, i1, i2)
            roots = {x: uf_find(parent, x) for x in parent}
            if len(set(roots.values())) >= 2:
                accepted_keys.append(ck)
                accepted_rows.extend(
                    (cid, f"{ck}.{root}") for cid, root in roots.items())
                break

    if not accepted_keys:
        return assign
    spark = assign.sparkSession
    # Arrow overload with an explicit schema, NOT local_rows_df:
    # vertices of accepted clusters can approach 2 x
    # cc_driver_max_edges, and local_rows_df's single-partition output
    # would bottleneck the member join at that top end
    comps = spark.createDataFrame(
        pd.DataFrame(accepted_rows, columns=["clip_id", "new_key"]),
        "clip_id string, new_key string")
    acc_keys = local_rows_df(spark, [(k,) for k in accepted_keys],
                             "cluster_key string")
    acc = (members.join(F.broadcast(acc_keys), "cluster_key", "leftsemi")
           .join(comps, "clip_id", "left")
           .select("clip_id",
                   F.when(F.col("new_key").isNotNull(), F.col("new_key"))
                    .otherwise(None if singletons_to_noise
                               else F.col("cluster_key")).alias("new_key"),
                   F.lit(True).alias("_sub")))
    return _merge_assign(assign, acc.localCheckpoint(eager=True))


def subdivide_ladder(clusters: DataFrame, edges: DataFrame, max_size: int,
                     thresholds: Iterable[float],
                     cfg: DedupConfig = DEFAULT_CONFIG,
                     score_col: str = "score",
                     cluster_col: str = "cluster_id",
                     singletons_to_noise: bool = True) -> DataFrame:
    """C8/C9 core: re-run connected components over each oversized
    cluster's internal edges at progressively stricter score
    thresholds; accept the FIRST rung that splits a cluster into >= 2
    sub-components (reference accepts the first eps with n_clusters
    >= 2, subdivision_engine_v3.py:417-441).

    All oversized clusters ride the same distributed jobs; a cluster
    leaves the ladder as soon as one rung splits it. Members discon-
    nected at the accepted rung mirror the reference's DBSCAN-noise
    relabeling: NULL (noise) when `singletons_to_noise`, else kept in
    their parent cluster.

    Returns the full assignment (clip_id, cluster_key); split members
    get "<parent>.<sub-representative>" keys. Clusters no rung can
    split keep their key (caller falls through to KMeans/force).

    Two execution regimes with identical output (pinned by
    tests/test_subdivide.py::test_ladder_driver_matches_distributed):

    * intra edge count <= cfg.cc_driver_max_edges: ONE collect of the
      (already checkpointed) intra edge set and the whole rung ladder
      runs driver-side — the same small-graph contract as
      operators/cc._driver_union_find, which the distributed loop
      would otherwise re-enter once per rung, re-collecting the SAME
      edges every time (a ladder that never splits pays
      len(thresholds) collects + checkpoints for one answer);
    * larger: the original per-rung distributed loop (each rung one
      CC job over the shared checkpoint — never a job per cluster).
    """
    assign = _norm_assign(clusters, cluster_col)
    target = _oversized_keys(assign, max_size).localCheckpoint(eager=True)
    if target.isEmpty():
        return assign

    a1 = assign.select(F.col("clip_id").alias("id_1"),
                       F.col("cluster_key").alias("ck1"))
    a2 = assign.select(F.col("clip_id").alias("id_2"),
                       F.col("cluster_key").alias("ck2"))
    intra = (edges.select("id_1", "id_2", F.col(score_col).alias("_score"))
             .join(a1, "id_1").join(a2, "id_2")
             .where(F.col("ck1") == F.col("ck2"))
             .join(target.withColumnRenamed("cluster_key", "ck1"),
                   "ck1", "leftsemi")
             .select(F.col("ck1").alias("cluster_key"), "id_1", "id_2", "_score")
             .localCheckpoint(eager=True))  # reused by every rung
    members = (assign.join(target, "cluster_key", "leftsemi")
               .localCheckpoint(eager=True))

    if intra.count() <= cfg.cc_driver_max_edges:
        return _ladder_driver(assign, members, intra, thresholds,
                              singletons_to_noise)

    remaining = target
    accepted = None
    for t in thresholds:
        if remaining.isEmpty():
            break
        e_t = (intra.join(remaining, "cluster_key", "leftsemi")
               .where(F.col("_score") >= F.lit(t)))
        comps = connected_components(e_t.select("id_1", "id_2"), cfg)
        mem = members.join(remaining, "cluster_key", "leftsemi")
        sub = mem.join(comps, "clip_id", "left")  # component NULL = singleton
        n_sub = (sub.where(F.col("component").isNotNull())
                 .groupBy("cluster_key")
                 .agg(F.countDistinct("component").alias("n_sub")))
        ok = n_sub.where(F.col("n_sub") >= 2).select("cluster_key")
        acc = (sub.join(ok, "cluster_key", "leftsemi")
               .select("clip_id",
                       F.when(F.col("component").isNotNull(),
                              F.concat_ws(".", "cluster_key", "component"))
                        .otherwise(None if singletons_to_noise
                                   else F.col("cluster_key")).alias("new_key"),
                       F.lit(True).alias("_sub")))
        accepted = acc if accepted is None else accepted.unionByName(acc)
        remaining = (remaining.join(ok, "cluster_key", "left_anti")
                     .localCheckpoint(eager=True))

    if accepted is None:
        return assign
    return _merge_assign(assign, accepted.localCheckpoint(eager=True))


# --------------------------------------------------------------------------
# C7: per-group KMeans inside applyInPandas
# --------------------------------------------------------------------------

def _kmeans_fit_predict(X: np.ndarray, k: int, seed: int,
                        sample_max: int = 5000, iters: int = 20) -> np.ndarray:
    """Deterministic seeded Lloyd's with kmeans++-style init, fit on a
    sample of <= sample_max rows, predict all (the reference's
    fit-on-sample shape, subdivision_engine_v3.py:296-334)."""
    rng = np.random.default_rng(seed)
    n = len(X)
    k = max(1, min(k, n))
    S = X if n <= sample_max else X[rng.choice(n, sample_max, replace=False)]

    def d2_to(pts: np.ndarray, cents: np.ndarray) -> np.ndarray:
        # ||x||^2 - 2 x.C + ||c||^2 matmul form: O(n*k) memory, never
        # the O(n*k*dim) (pts[:,None,:]-cents)**2 broadcast temporary
        # (at 1e6 members x 100 centers x 64 dims that temporary is
        # ~5 TB — instant executor OOM inside the pandas UDF task)
        d = ((pts * pts).sum(1)[:, None] - 2.0 * (pts @ cents.T)
             + (cents * cents).sum(1)[None, :])
        return np.maximum(d, 0.0)

    centers = [S[int(rng.integers(len(S)))]]
    best_d2 = d2_to(S, np.asarray(centers))[:, 0]  # running min, O(n)
    for _ in range(1, k):
        tot = float(best_d2.sum())
        idx = (int(rng.integers(len(S))) if tot <= 0.0
               else int(rng.choice(len(S), p=best_d2 / tot)))
        centers.append(S[idx])
        best_d2 = np.minimum(best_d2, d2_to(S, S[idx][None])[:, 0])
    C = np.asarray(centers, dtype=np.float64)
    for _ in range(iters):
        lab = d2_to(S, C).argmin(1)
        newC = np.array([S[lab == j].mean(0) if (lab == j).any() else C[j]
                         for j in range(k)])
        if np.allclose(newC, C):
            break
        C = newC
    return d2_to(X, C).argmin(1)


def subdivide_kmeans(clusters: DataFrame, features: DataFrame,
                     max_size: int, feature_col: str = "embedding",
                     seed: int = 42, sample_max: int = 5000,
                     cluster_col: str = "cluster_id") -> DataFrame:
    """C7: re-cluster every oversized cluster's members with seeded
    KMeans (k = ceil(size / max_size)) over a per-record feature
    vector — the reference's FastKMeans subdivision
    (subdivision_engine_v3.py:264-354, fit-on-sample predict-on-all).

    One `applyInPandas` job fits ALL oversized clusters (each group
    sorted by clip_id for determinism), then ONE left join applies the
    sub-assignments — constant plan depth and no serial driver-side
    fits (the previous per-cluster chained-join loop grew lineage
    O(#oversized clusters)).

    Members without features keep their cluster. Groups land wholly in
    one task (applyInPandas contract): route clusters beyond ~1e6
    members through `subdivide_force`/`subdivide_ladder` first — the
    adaptive loop's `force_above` guard does exactly that."""
    assign = _norm_assign(clusters, cluster_col)
    big = _oversized_keys(assign, max_size)
    mem = (assign.join(big, "cluster_key", "leftsemi")
           .join(features.select("clip_id",
                                 F.col(feature_col).cast("array<double>")
                                 .alias("_fv")), "clip_id")
           # a feature ROW with a NULL vector must behave like a missing
           # row ("members without features keep their cluster"), not
           # crash np.vstack in the executor
           .where(F.col("_fv").isNotNull()))

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("clip_id").reset_index(drop=True)
        X = np.vstack(pdf["_fv"].to_numpy()).astype(np.float64)
        k = min(math.ceil(len(pdf) / max_size), len(pdf))
        lab = _kmeans_fit_predict(X, k, seed, sample_max)
        key = pdf["cluster_key"].iloc[0]
        return pd.DataFrame({
            "clip_id": pdf["clip_id"],
            "new_key": [f"{key}_k{b}" for b in lab],
        })

    sub = (mem.groupBy("cluster_key")
           .applyInPandas(fit_group, schema="clip_id string, new_key string")
           .withColumn("_sub", F.lit(True)))
    return _merge_assign(assign, sub)


# --------------------------------------------------------------------------
# C10: guaranteed-progress force split
# --------------------------------------------------------------------------

def subdivide_force(clusters: DataFrame, max_size: int,
                    cluster_col: str = "cluster_id") -> DataFrame:
    """C10 ForceStrategy analog: deterministic round-robin split of
    every oversized cluster into ceil(size/max_size) buckets — always
    makes progress AND always bounds the result (every bucket gets
    floor/ceil(size/k) members), one distributed pass, no loop
    (subdivision_engine_v3.py:522-598; the reference's PCA+KMeans is
    replaced because guaranteed progress is the only contract here —
    a hash split is NOT guaranteed: all members of a small cluster can
    collide into one bucket, and being deterministic it would never
    unstick).

    The row_number window is partitioned BY CLUSTER — each oversized
    cluster sorts within one task. Bounded by the adaptive loop's
    `force_above` routing at sane sizes; a pathological single cluster
    of ~10^8+ members would need a two-level split (hash pre-salt,
    then round-robin within salt)."""
    from pyspark.sql import Window

    assign = _norm_assign(clusters, cluster_col)
    big = (assign.where(clustered("cluster_key"))
           .groupBy("cluster_key").agg(F.count(F.lit(1)).alias("size"))
           .where(F.col("size") > max_size))
    # window only over the oversized clusters' members (semi-join
    # first), never a sort of the whole assignment
    members = assign.join(big, "cluster_key")
    rn = F.row_number().over(
        Window.partitionBy("cluster_key").orderBy("clip_id")) - 1
    bucket = F.pmod(rn, F.ceil(F.col("size") / max_size).cast("long"))
    sub = members.select(
        "clip_id",
        F.concat(F.col("cluster_key"), F.lit("_f"), bucket).alias("new_key"),
        F.lit(True).alias("_sub"))
    return _merge_assign(assign, sub)


# --------------------------------------------------------------------------
# C6: adaptive driver loop
# --------------------------------------------------------------------------

def subdivide_adaptive(clusters: DataFrame, edges: DataFrame, max_size: int,
                       features: DataFrame | None = None,
                       cfg: DedupConfig = DEFAULT_CONFIG,
                       base_threshold: float = 0.99,
                       high_threshold: float | None = None,
                       max_depth: int = 20, timeout_s: float = 300.0,
                       force_above: int = 10_000,
                       score_col: str = "score",
                       feature_col: str = "embedding",
                       seed: int = 42,
                       use_force: bool = True,
                       cluster_col: str = "cluster_id",
                       ) -> tuple[DataFrame, dict]:
    """C6: while any cluster exceeds max_size — depth <= max_depth,
    wall-clock budget, no-progress break (reference loop shape at
    adaptive_clusterer_v3.py:71-104) — subdivide each level with the
    reference's strategy priority:

      force          clusters > force_above members, or > 70% of the
                     time budget spent (strategy hint,
                     adaptive_clusterer_v3.py:195-212)
      ladder smart   C8 rungs from the C13 depth schedule
      ladder aggr.   C9 rungs, for persistent clusters
                     (depth >= 3, size >= 500 — C9 can_handle)
      kmeans         clusters the ladders could not split, when
                     `features` are available
      force          last resort (guaranteed progress) when allowed

    Each level runs O(#strategies) distributed jobs — never a job per
    cluster. Returns (assignment, stats); stats mirrors the
    reference's levels/strategy-usage accounting."""
    t0 = time.time()
    high = cfg.jaccard_threshold if high_threshold is None else high_threshold
    assign = _norm_assign(clusters, cluster_col).localCheckpoint(eager=True)
    stats: dict = {"max_cluster_size": max_size, "levels": [],
                   "total_subdivisions": 0}

    for depth in range(max_depth):
        elapsed = time.time() - t0
        if elapsed > timeout_s:
            stats["stopped"] = "timeout"
            break
        sizes = (assign.where(clustered("cluster_key"))
                 .groupBy("cluster_key").agg(F.count(F.lit(1)).alias("size"))
                 .where(F.col("size") > max_size))
        over = {r.cluster_key: int(r.size) for r in sizes.collect()}
        if not over:
            stats["stopped"] = "converged"
            break
        level = {"depth": depth, "n_oversized": len(over), "usage": {}}

        def run(strategy: str, keys: list[str], cur: DataFrame) -> DataFrame:
            # isin over the oversized-key list: bounded by #oversized
            # CLUSTERS (metadata, not rows). Chunk-free guard: beyond
            # ~1k literals codegen'd In-predicates get fragile (see
            # operators/verify._IDS_PUSHDOWN_MAX), so large lists go
            # through a semi/anti join instead.
            if len(keys) <= 1000:
                in_keys = F.col("cluster_key").isin(keys)
                tgt = cur.where(in_keys)
                rest = cur.where(~in_keys | F.col("cluster_key").isNull())
            else:
                kdf = local_rows_df(cur.sparkSession,
                                    [(k,) for k in keys], "cluster_key string")
                tgt = cur.join(F.broadcast(kdf), "cluster_key", "leftsemi")
                rest = cur.join(F.broadcast(kdf), "cluster_key", "left_anti")
            if strategy == "force":
                done = subdivide_force(tgt, max_size, cluster_col="cluster_key")
            elif strategy == "kmeans":
                done = subdivide_kmeans(tgt, features, max_size,
                                        feature_col=feature_col, seed=seed,
                                        cluster_col="cluster_key")
            else:
                t_d = adaptive_threshold(depth, base_threshold, high)
                rungs = ladder_thresholds(depth, t_d, kind=strategy)
                done = subdivide_ladder(tgt, edges, max_size, rungs, cfg,
                                        score_col=score_col,
                                        cluster_col="cluster_key")
            return rest.unionByName(done)

        def still_oversized(cur: DataFrame, keys: list[str]) -> set:
            # same >1k-literal guard as run(): a corpus with many
            # thousands of oversized clusters must not rebuild the
            # giant In-predicate the main path explicitly avoids
            if len(keys) <= 1000:
                flt = cur.where(F.col("cluster_key").isin(list(keys)))
            else:
                kdf = local_rows_df(cur.sparkSession,
                                    [(k,) for k in keys], "cluster_key string")
                flt = cur.join(F.broadcast(kdf), "cluster_key", "leftsemi")
            return {r.cluster_key for r in
                    (flt.groupBy("cluster_key")
                     .agg(F.count(F.lit(1)).alias("size"))
                     .where(F.col("size") > max_size).collect())}

        hurry = elapsed > 0.7 * timeout_s
        forced = [k for k, s in over.items()
                  if use_force and (s > force_above or hurry)]
        laddered = [k for k in over if k not in set(forced)]
        if forced:
            assign = run("force", forced, assign)
            level["usage"]["force"] = len(forced)
        if laddered:
            assign = run("smart", laddered, assign).localCheckpoint(eager=True)
            # which of them actually split?
            still = still_oversized(assign, laddered)
            level["usage"]["ladder_smart"] = len(laddered) - len(still)
            aggr = [k for k in still if depth >= 3 and over[k] >= 500]
            if aggr:
                assign = run("aggressive", aggr, assign).localCheckpoint(eager=True)
                rem = still_oversized(assign, aggr)
                level["usage"]["ladder_aggressive"] = len(aggr) - len(rem)
                still = (still - set(aggr)) | rem
            if still and features is not None:
                targets = sorted(still)
                assign = run("kmeans", targets, assign).localCheckpoint(eager=True)
                # KMeans is NOT guaranteed to split (identical feature
                # vectors collapse every center onto one point: every
                # member lands in bucket "<key>_k0", RENAMED but not
                # split) — verify against the targets AND their _k
                # descendants, and route survivors to force
                over2 = {r.cluster_key for r in
                         (assign.where(clustered("cluster_key"))
                          .groupBy("cluster_key")
                          .agg(F.count(F.lit(1)).alias("size"))
                          .where(F.col("size") > max_size).collect())}
                tset = set(targets)
                still = {k for k in over2
                         if k in tset
                         or any(k.startswith(t + "_k") for t in tset)}
                # usage counts progressed TARGETS (one target can leave
                # several oversized _k children in `still`; subtracting
                # len(still) would go negative and fake a no_progress)
                unresolved = {t for t in tset
                              if t in over2
                              or any(k.startswith(t + "_k") for k in over2)}
                level["usage"]["kmeans"] = len(targets) - len(unresolved)
            if still and use_force:
                assign = run("force", sorted(still), assign)
                level["usage"]["force"] = level["usage"].get("force", 0) + len(still)
                still = set()
        assign = assign.localCheckpoint(eager=True)  # cut per-level lineage
        made = sum(level["usage"].values())
        level["subdivisions_made"] = made
        stats["levels"].append(level)
        stats["total_subdivisions"] += made
        if made == 0:
            stats["stopped"] = "no_progress"
            break
    else:
        stats["stopped"] = "max_depth"

    stats["final_depth"] = len(stats["levels"])
    stats["total_time_s"] = round(time.time() - t0, 3)
    return assign, stats
