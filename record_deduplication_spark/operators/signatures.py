"""Signature stage: normalize + MinHash bands + SimHash PCM fingerprint.

All Python work is vectorized Arrow `pandas_udf`s over the shared
kernels in ``functions/`` (north rule: no per-row Python; the
reference's per-row ``df.apply`` pattern at
/root/reference/src/core/preprocess_engine.py:155,177-179 is exactly
what this replaces). Everything else is JVM-side built-ins
(`sha2`, `size`, `length`).

Scale notes (10^12 clips):
- `bytes` is consumed HERE (fingerprint + sha) and then dropped; the
  binary payload never crosses a shuffle (SURVEY.md §7.3). Final PCM
  verification re-joins bytes only for surviving candidate pairs.
- band hashes are computed inside the UDF (signature never
  materialized as a column) to keep shuffle width small.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DedupConfig
from ..functions import audio as A
from ..functions import hashing as H
from ..functions import text as X


def normalize_udf():
    @F.pandas_udf(T.StringType())
    def _norm(s: pd.Series) -> pd.Series:
        return X.normalize_series(s)
    return _norm


def band_hashes_udf(cfg: DedupConfig):
    """transcript_norm -> ARRAY<LONG> of LSH band keys (empty if no shingles)."""
    num_perm, bands, k, seed = cfg.num_perm, cfg.lsh_bands, cfg.shingle_k, cfg.minhash_seed

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _bands(s: pd.Series) -> pd.Series:
        a_coef, b_coef = H.minhash_params(num_perm, seed)
        out = []
        for txt in s:
            sh = X.shingles(X.tokenize(txt or ""), k)
            if not sh:
                out.append([])
                continue
            sig = H.minhash_signature(H.hash_strs_u64(sh), a_coef, b_coef)
            out.append([int(v) for v in H.band_hashes(sig, bands)])
        return pd.Series(out)
    return _bands


def lgram_hashes_udf(cfg: DedupConfig):
    """transcript_norm -> ARRAY<LONG> distinct L-token-gram hashes
    (the exact-substring stage's blocking keys; suffix-array
    verification runs later on candidate pairs)."""
    L = cfg.substring_min_tokens

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _grams(s: pd.Series) -> pd.Series:
        out = []
        for txt in s:
            gs = X.grams(X.tokenize(txt or ""), L)
            seen: dict[int, None] = {}
            for g in gs:
                h = H.hash_str_u64(g)
                if h >= 1 << 63:
                    h -= 1 << 64
                seen.setdefault(h)
            out.append(list(seen.keys()))
        return pd.Series(out)
    return _grams


def pcm_fingerprint_udf(cfg: DedupConfig):
    """bytes -> 64-bit SimHash-style PCM fingerprint (LONG, null if undecodable)."""
    n_frames = cfg.fp_frames

    @F.pandas_udf(T.LongType())
    def _fp(b: pd.Series) -> pd.Series:
        out = []
        for data in b:
            if data is None:
                out.append(None)
                continue
            try:
                pcm, _ = A.decode_wav(bytes(data))
                out.append(A.pcm_fingerprint(pcm, n_frames))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype="object")
    return _fp


def simhash_bands_udf(cfg: DedupConfig):
    """fingerprint LONG -> ARRAY<LONG> of k+1 Hamming band values."""
    n_bands = cfg.simhash_hamming_k + 1

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sb(fp: pd.Series) -> pd.Series:
        return pd.Series(
            [None if v is None or pd.isna(v) else H.simhash_bands(int(v), n_bands)
             for v in fp], dtype="object")
    return _sb


def add_signatures(clips: DataFrame, cfg: DedupConfig) -> DataFrame:
    """clips -> normalized/signed table. Drops `bytes` (never shuffled).

    Output: clip_id, sr_hz, dur_ms, codec, transcript, transcript_norm,
            n_tokens, sha_bytes, pcm_fp, band_hashes, fp_bands, lgram_hashes
    """
    normed = (
        clips
        .withColumn("transcript_norm", normalize_udf()(F.col("transcript")))
        .withColumn("n_tokens",
                    F.when(F.col("transcript_norm") == "", F.lit(0))
                     .otherwise(F.size(F.split(F.col("transcript_norm"), " "))))
        .withColumn("sha_bytes", F.sha2(F.col("bytes"), 256))
        .withColumn("pcm_fp", pcm_fingerprint_udf(cfg)(F.col("bytes")))
    )
    return (
        normed
        .withColumn("band_hashes", band_hashes_udf(cfg)(F.col("transcript_norm")))
        .withColumn("fp_bands", simhash_bands_udf(cfg)(F.col("pcm_fp")))
        .withColumn("lgram_hashes", lgram_hashes_udf(cfg)(F.col("transcript_norm")))
        .drop("bytes")
    )
