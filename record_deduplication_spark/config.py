"""Shared dedup configuration.

One dataclass serialized into BOTH the single-process oracle
(`record_deduplication_spark.oracle`) and the Spark pipeline
(`record_deduplication_spark.plans.pipeline`) so that shingle size,
hash seeds, band geometry and thresholds are identical on both sides.

The reference scatters its equivalent constants through the code
(e.g. blocking window=5 at /root/reference/src/core/blocking_engine.py:105-113,
thresholds at /root/reference/src/core/model_engine.py:54-124); a single
shared config is the fix for that pitfall (SURVEY.md §7.3).
"""

from __future__ import annotations

from dataclasses import dataclass, asdict


@dataclass(frozen=True)
class DedupConfig:
    # --- text / shingling ---
    shingle_k: int = 3                 # word-shingle size
    # --- MinHash-LSH (transcript near-dup) ---
    num_perm: int = 64                 # MinHash permutations
    lsh_bands: int = 16                # bands (rows = num_perm // bands = 4)
    jaccard_threshold: float = 0.80    # verify threshold on exact shingle Jaccard
    minhash_seed: int = 42
    # --- SimHash (audio near-dup over decoded-PCM fingerprints) ---
    fp_frames: int = 64                # energy-envelope frames (multimodal features)
    fp_time_frames: int = 17           # spectral fingerprint: (17-1) time diffs
    fp_freq_bands: int = 4             #   x 4 log-spaced Hz bands = 64 bits
    fp_fmin_hz: float = 50.0
    fp_fmax_hz: float = 3800.0
    simhash_hamming_k: int = 3         # pigeonhole band count = k+1 (blocking)
    simhash_hamming_verify: int = 10   # max Hamming accepted at verification
                                       # (blocking recall beyond k is
                                       # probabilistic: flips spread over 64
                                       # bits rarely hit all k+1 bands)
    snr_db_min: float = 30.0           # per-row invariant: decoded-PCM allclose at SNR>=30dB
    # --- suffix-array exact-substring ---
    substring_min_tokens: int = 8      # L: min shared contiguous token run
    # --- skew handling ---
    max_block_full_pairs: int = 64     # full pairwise join only for blocks <= this size
    hot_block_neighbor_w: int = 8      # sorted-neighbor pairing width inside hot sub-blocks
    hot_block_salt_target: int = 1024  # salted sub-block size for hot blocks:
                                       # salt = pmod(xxhash64(clip_id), ceil(bsz/target));
                                       # a hot band spreads over bsz/target tasks
                                       # instead of one (north-rule salted repartition)
    # --- clustering ---
    noise_label: int = -1              # singleton convention
                                       # (reference: /root/reference/src/core/clustering_engine.py:527-529)
    cc_checkpoint_every: int = 3       # truncate CC lineage every N iterations
    cc_max_iters: int = 50
    # below this edge count, connected components runs as a single
    # driver-side path-compressed union-find (one collect, one job —
    # the reference's G1); above it, the distributed alternating-star
    # algorithm takes over. MEASURED driver-side Python footprint
    # (tests/test_cc.py::test_driver_max_edges_budget): ~515 B/edge for
    # Row objects of two 13-char string ids + the union-find dict —
    # ~1.0 GB at this 2M default, ~5.2 GB at the r2 default of 10M
    # (which would OOM a standard 8 GB cluster driver; this sandbox's
    # 128 GiB masked it). A 10^12-clip corpus crosses the threshold
    # and uses the O(log^2 n) star rounds either way.
    cc_driver_max_edges: int = 2_000_000

    @property
    def lsh_rows(self) -> int:
        # ValueError, not assert: must survive python -O (a silently
        # truncated rows-per-band changes band geometry and breaks
        # oracle/engine parity); the CLI validates this at parse time
        # too, so interactive misconfigurations fail before any job
        if self.num_perm % self.lsh_bands != 0:
            raise ValueError(
                f"num_perm={self.num_perm} must be divisible by "
                f"lsh_bands={self.lsh_bands}")
        return self.num_perm // self.lsh_bands

    def to_dict(self) -> dict:
        return asdict(self)


DEFAULT_CONFIG = DedupConfig()
