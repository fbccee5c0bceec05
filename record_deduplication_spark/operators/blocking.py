"""Candidate-pair generation (blocking) — the algorithmic core.

Reference analog: B1-B6 at /root/reference/src/core/blocking_engine.py:51-128
(exact blocks + sorted-neighbourhood + pair-set union). Here the block
keys are the north rule's: exact (sha256+transcript), MinHash-LSH band
hashes, SimHash Hamming bands over PCM fingerprints, and L-token-gram
keys for the exact-substring stage.

All four block families are collapsed into ONE member table
(clip_id, source, bkey) with bkey = xxhash64(source, key parts) —
JVM-side, 64-bit; a cross-family hash collision only produces an extra
candidate that verification rejects, never recall loss. Pair
generation is then a single window + single range self-join instead of
four of each (4x fewer shuffles).

Skew strategy (SURVEY.md §7.3 "Hot-band skew", the 10^12-scale killer):
a block of m members naively yields O(m^2) pairs. Single scale-safe
policy:

  * block size <= cfg.max_block_full_pairs: full pairwise join
    (small-dim behavior, matches the oracle's full-pairing exactly);
  * larger (hot) blocks: sort members by clip_id inside the block and
    pair each with its next `hot_block_neighbor_w` neighbors — LINEAR
    in block size. Chain connectivity keeps the block's component
    intact for connected-components clustering, so cluster-level
    recall is preserved while the pair count is bounded.

Both paths are a row_number window + range self-join on the block key,
so Catalyst plans an equi-join on (source, bkey) with a range filter;
AQE handles residual partition skew. Within-block ordering by clip_id
keeps output deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DedupConfig

PAIR_COLS = ("id_1", "id_2", "source")


def block_members(signed: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Union of all block families as (clip_id, source, bkey)."""
    exact = (signed
             .where(F.col("sha_bytes").isNotNull())
             .select("clip_id", F.lit("exact").alias("source"),
                     F.xxhash64(F.lit("exact"), "sha_bytes", "transcript_norm")
                     .alias("bkey")))
    lsh = (signed
           .select("clip_id", F.posexplode("band_hashes").alias("band_idx", "band_hash"))
           .select("clip_id", F.lit("lsh").alias("source"),
                   F.xxhash64(F.lit("lsh"), "band_idx", "band_hash").alias("bkey")))
    simhash = (signed
               .where(F.col("pcm_fp").isNotNull())
               .select("clip_id", F.posexplode("fp_bands").alias("fband_idx", "fband_val"))
               .select("clip_id", F.lit("simhash").alias("source"),
                       F.xxhash64(F.lit("simhash"), "fband_idx", "fband_val").alias("bkey")))
    substring = (signed
                 .select("clip_id", F.explode("lgram_hashes").alias("lgram"))
                 .select("clip_id", F.lit("substring").alias("source"),
                         F.xxhash64(F.lit("sub"), "lgram").alias("bkey")))
    return exact.unionByName(lsh).unionByName(simhash).unionByName(substring)


def pairs_within_blocks(members: DataFrame, cfg: DedupConfig,
                        materialize: bool = True) -> DataFrame:
    """(clip_id, source, bkey) -> (id_1 < id_2, source), linear per block."""
    w = Window.partitionBy("source", "bkey").orderBy("clip_id")
    m = (members
         .withColumn("rn", F.row_number().over(w))
         .withColumn("bsz", F.count(F.lit(1)).over(Window.partitionBy("source", "bkey"))))
    # singleton blocks can't pair — drop them before the join (the vast
    # majority of blocks at scale)
    m = m.where(F.col("bsz") > 1)
    if materialize:
        # a self-join physically evaluates its child once PER SIDE; the
        # windowed member table is expensive (signature explode + sort),
        # so pin it before aliasing (on a cluster: persist/checkpoint)
        m = m.localCheckpoint(eager=True)

    a, b = m.alias("a"), m.alias("b")
    cap, nb = cfg.max_block_full_pairs, cfg.hot_block_neighbor_w
    joined = a.join(
        b,
        [F.col("a.source") == F.col("b.source"),
         F.col("a.bkey") == F.col("b.bkey"),
         F.col("b.rn") > F.col("a.rn"),
         # full pairing for small blocks, neighbor-w chain for hot ones
         (F.col("a.bsz") <= cap) | (F.col("b.rn") <= F.col("a.rn") + nb)])
    return joined.select(F.col("a.clip_id").alias("id_1"),
                         F.col("b.clip_id").alias("id_2"),
                         F.col("a.source").alias("source"))


def generate_candidates(signed: DataFrame, cfg: DedupConfig) -> DataFrame:
    """B1-B5 in one pass: members -> pairs -> per-pair source set."""
    pairs = pairs_within_blocks(block_members(signed, cfg), cfg)
    return (pairs
            .groupBy("id_1", "id_2")
            .agg(F.collect_set("source").alias("sources")))


def reduction_ratio(n_records: int, n_pairs: int) -> float:
    """B6-analog (reference /root/reference/src/core/blocking_engine.py:188-202)."""
    total = n_records * (n_records - 1) / 2
    return 1.0 - (n_pairs / total) if total else 1.0
