"""End-to-end dedup pipeline: the engine's flagship dataflow.

normalize+sign -> block (exact | MinHash-LSH | SimHash | L-gram)
-> union candidates -> verify (text/substring/audio) -> dup edges
-> connected components -> cluster table (+ stats, metrics).

Stage-as-checkpoint is the load-bearing design the reference implies
but never finished (its orchestrator is dead code —
/root/reference/src/pipeline/orchestrator.py:90-166, SURVEY.md §3.4):
every stage here commits a table via CheckpointStore and `resume=True`
skips completed stages.

Scale posture (designed for 10^12 clips / 1000 executors even though
tests run local[32]):
- `bytes` never crosses a shuffle: fingerprints + sha computed in the
  signature scan, payload re-joined only for surviving audio pairs.
- candidate generation is linear per block (capped/neighbor pairing);
  hot LSH bands cannot go quadratic.
- CC is large-star/small-star: O(log^2) rounds, skew-balanced.
- All joins are key-equi joins Catalyst can plan as shuffle hash /
  sort-merge with AQE skew splitting; no driver-side loops over rows.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DedupConfig, DEFAULT_CONFIG
from ..operators import blocking as B
from ..operators.cc import assign_clusters, connected_components
from ..operators.signatures import add_signatures
from ..operators.stats import clustered
from ..operators.verify import build_edges
from ..sources.checkpoint import CheckpointStore


@dataclass
class PipelineResult:
    clusters: DataFrame
    edges: DataFrame
    candidates: DataFrame
    stats: dict
    subdivided: DataFrame | None = None  # (clip_id, cluster_key), only
    #   when run(max_cluster_size=...) requested size-bounded output


class DedupPipeline:
    def __init__(self, spark: SparkSession, workdir: str,
                 cfg: DedupConfig = DEFAULT_CONFIG):
        self.spark = spark
        self.cfg = cfg
        self.store = CheckpointStore(spark, workdir)

    def _stage(self, name: str, run_id: int, resume: bool, build) -> tuple[DataFrame, int]:
        if resume and self.store.exists(name):
            df = self.store.read(name)
            return df, df.count()
        t0 = time.time()
        df = self.store.write(name, build())
        # per-partition lineage from commit METADATA (parquet footers /
        # Iceberg manifests) — no job over the data, skew visible in
        # the lineage table, and the row count comes for free
        part_rows = self.store.partition_rows(name)
        rows = sum(n for _, n in part_rows)
        self.store.log(run_id, name, t0, rows, len(part_rows),
                       partition_rows_max=max((n for _, n in part_rows), default=0),
                       partition_rows_min=min((n for _, n in part_rows), default=0))
        self.store.log_partitions(run_id, name, part_rows)
        return df, rows

    def run(self, clips: DataFrame, resume: bool = True,
            max_cluster_size: int | None = None) -> PipelineResult:
        cfg = self.cfg
        run_id = self.store.next_run_id()

        signed, n_clips = self._stage("signed", run_id, resume,
                                      lambda: add_signatures(clips, cfg))

        cands, n_cands = self._stage(
            "candidates", run_id, resume,
            lambda: B.generate_candidates(signed, cfg))

        edges, n_edges = self._stage(
            "edges", run_id, resume,
            lambda: build_edges(cands, signed, clips, cfg))

        clusters, _ = self._stage(
            "clusters", run_id, resume,
            lambda: assign_clusters(
                signed.select("clip_id"),
                connected_components(edges.select("id_1", "id_2"), cfg),
                cfg))

        subdivided = None
        if max_cluster_size is not None:
            subdivided, _ = self._stage(
                "clusters_sub", run_id, resume,
                lambda: self._subdivide(clusters, edges, signed,
                                        max_cluster_size))

        stats = {
            "n_clips": n_clips,
            "n_candidates": n_cands,
            "n_edges": n_edges,
            "n_clusters": clusters.where(clustered())
                                  .select("cluster_id").distinct().count(),
            "reduction_ratio": B.reduction_ratio(n_clips, n_cands),
        }
        self.store.log(run_id, "pipeline_done", time.time(), n_clips, 0, **stats)
        self.store.flush()
        return PipelineResult(clusters=clusters, edges=edges,
                              candidates=cands, stats=stats,
                              subdivided=subdivided)

    def _subdivide(self, clusters: DataFrame, edges: DataFrame,
                   signed: DataFrame, max_size: int) -> DataFrame:
        """C6 post-stage: size-bound the cluster table via the adaptive
        subdivision loop. Verified edges carry per-verdict score
        scales; edge_prob01 maps them onto one [0, 1] similarity for
        the threshold ladders (shared with the review report). The
        64-bit PCM fingerprint doubles as a 64-dim bit-vector feature
        so the C7 KMeans strategy gets a similarity-aware split in the
        production path too (not only when a caller supplies
        embeddings) before force is needed."""
        from ..operators.subdivide import subdivide_adaptive
        from ..operators.verify import edge_prob01
        e = edges.select("id_1", "id_2", edge_prob01().alias("score"))
        fp_bits = (signed
                   .where(F.col("pcm_fp").isNotNull())
                   .select("clip_id",
                           F.expr("transform(sequence(0, 63), "
                                  "b -> CAST((pcm_fp >> b) & 1 AS DOUBLE))")
                           .alias("embedding")))
        out, substats = subdivide_adaptive(
            clusters, e, max_size, cfg=self.cfg, features=fp_bits,
            high_threshold=self.cfg.jaccard_threshold)
        self.last_subdivision_stats = substats
        return out

    def model_stage(self, feats: DataFrame,
                    feature_cols: tuple[str, ...] = ("jaccard",),
                    resume: bool = True) -> dict:
        """M1-M2 + S5 as a RESUMABLE stage: train the pair-scoring
        model (heuristic labels -> driver IRLS logistic) and commit
        the coefficients as a `model` checkpoint table; with
        resume=True an existing table is read back instead of
        retraining — the model path now has the same kill/relaunch
        contract as every data stage (the reference joblib-dumps its
        model but has no resume around it,
        /root/reference/src/core/model_engine.py:374-376).

        Returns the coefficient dict {"intercept": b0, "coef": {...}}."""
        from ..operators.model import (heuristic_labels, model_from_rows,
                                       model_to_rows, train_logistic)
        if resume and self.store.exists("model"):
            return model_from_rows(
                (r.term, r.value) for r in self.store.read("model").collect())
        run_id = self.store.next_run_id()
        t0 = time.time()
        labeled = heuristic_labels(feats, feature_cols=tuple(feature_cols))
        model = train_logistic(labeled, list(feature_cols))
        mdf = self.spark.createDataFrame(model_to_rows(model),
                                         "term string, value double")
        self.store.write("model", mdf.coalesce(1))
        self.store.log(run_id, "model", t0, len(model["coef"]) + 1, 1)
        self.store.flush()
        return model
