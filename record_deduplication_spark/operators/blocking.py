"""Candidate-pair generation (blocking) — the algorithmic core.

Reference analog: B1-B6 at /root/reference/src/core/blocking_engine.py:51-128
(exact blocks + sorted-neighbourhood + pair-set union). Here the block
keys are the north rule's: exact (sha256+transcript), MinHash-LSH band
hashes, SimHash Hamming bands over PCM fingerprints, and L-token-gram
keys for the exact-substring stage.

Skew strategy (SURVEY.md §7.3 "Hot-band skew", the 10^12-scale killer):
a block of m members naively yields O(m^2) pairs. We generate pairs
per block with a single scale-safe policy:

  * block size <= cfg.max_block_full_pairs: full pairwise self-join
    (small-dim behavior, matches oracle exactly);
  * larger (hot) blocks: sort members by clip_id inside the block and
    pair each with its next `hot_block_neighbor_w` neighbors — LINEAR
    in block size. Chain connectivity keeps the block's component
    intact for connected-components clustering, so cluster-level
    recall is preserved while the pair count is bounded.

Both paths are expressed as row_number window + range self-join on the
block key, so Catalyst plans an equi-join on the key with a range
filter; AQE handles residual partition skew. Within-block ordering by
clip_id keeps the output deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DedupConfig

PAIR_COLS = ("id_1", "id_2", "source")


def _pairs_within_blocks(members: DataFrame, key_cols: list[str],
                         cfg: DedupConfig, source: str) -> DataFrame:
    """members(key_cols..., clip_id) -> (id_1 < id_2, source)."""
    w = Window.partitionBy(*key_cols).orderBy("clip_id")
    m = (members
         .withColumn("rn", F.row_number().over(w))
         .withColumn("bsz", F.count(F.lit(1)).over(Window.partitionBy(*key_cols))))

    a = m.alias("a")
    b = m.alias("b")
    on = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in key_cols]

    small = (a.join(b, on + [F.col("a.bsz") <= cfg.max_block_full_pairs,
                             F.col("a.rn") < F.col("b.rn")])
             .select(F.col("a.clip_id").alias("id_1"),
                     F.col("b.clip_id").alias("id_2")))
    big = (a.join(b, on + [F.col("a.bsz") > cfg.max_block_full_pairs,
                           F.col("b.rn") > F.col("a.rn"),
                           F.col("b.rn") <= F.col("a.rn") + cfg.hot_block_neighbor_w])
           .select(F.col("a.clip_id").alias("id_1"),
                   F.col("b.clip_id").alias("id_2")))
    return small.unionByName(big).withColumn("source", F.lit(source))


def exact_candidates(signed: DataFrame, cfg: DedupConfig) -> DataFrame:
    """B1-analog: exact block on (sha256(bytes), transcript_norm)."""
    members = signed.select("sha_bytes", "transcript_norm", "clip_id")
    return _pairs_within_blocks(members, ["sha_bytes", "transcript_norm"], cfg, "exact")


def lsh_candidates(signed: DataFrame, cfg: DedupConfig) -> DataFrame:
    """B4-analog: MinHash-LSH banded blocking over transcript shingles.

    posexplode(band_hashes) -> (band_idx, band_hash) block keys. Clips
    with no shingles (empty transcript) have an empty array and drop
    out of the explode naturally.
    """
    members = (signed
               .select("clip_id", F.posexplode("band_hashes").alias("band_idx", "band_hash")))
    return _pairs_within_blocks(members, ["band_idx", "band_hash"], cfg, "lsh")


def simhash_candidates(signed: DataFrame, cfg: DedupConfig) -> DataFrame:
    """SimHash Hamming-band blocking over PCM fingerprints.

    k+1 bands of 64/(k+1) bits: pigeonhole guarantees any pair at
    Hamming distance <= k shares a band -> recall-complete candidate
    generation for the audio near-dup criterion.
    """
    members = (signed
               .where(F.col("pcm_fp").isNotNull())
               .select("clip_id", F.posexplode("fp_bands").alias("fband_idx", "fband_val")))
    return _pairs_within_blocks(members, ["fband_idx", "fband_val"], cfg, "simhash")


def substring_candidates(signed: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Exact-substring blocking: clips sharing any L-token-gram hash.

    Per-doc gram sets are already deduplicated in the signature UDF
    (the per-partition suffix-array dedup path at scale); suffix-array
    verification of the shared-run length happens in verify.py.
    """
    members = (signed
               .select("clip_id", F.explode("lgram_hashes").alias("lgram")))
    return _pairs_within_blocks(members, ["lgram"], cfg, "substring")


def union_candidates(*cands: DataFrame) -> DataFrame:
    """B5-analog: union + per-pair source set (dropDuplicates on the
    canonical (id_1, id_2) ordering each generator already guarantees)."""
    out = cands[0]
    for c in cands[1:]:
        out = out.unionByName(c)
    return (out
            .groupBy("id_1", "id_2")
            .agg(F.collect_set("source").alias("sources")))


def reduction_ratio(n_records: int, n_pairs: int) -> float:
    """B6-analog (reference /root/reference/src/core/blocking_engine.py:188-202)."""
    total = n_records * (n_records - 1) / 2
    return 1.0 - (n_pairs / total) if total else 1.0
