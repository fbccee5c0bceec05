"""Signature stage: normalize + MinHash bands + SimHash PCM fingerprint.

ONE fused `mapInPandas` pass computes every derived column per clip:
normalize once, tokenize once, decode the audio payload once. (The
first cut chained four pandas_udfs; Catalyst's projection collapse
re-evaluated the normalize UDF once per dependent column — the exact
per-row-Python trap the north rule bans, just at batch granularity.
Reference analog of the fused pass: the preprocess stage computes all
`*_clean` columns in one sweep, /root/reference/src/core/preprocess_engine.py:120-232.)

Scale notes (10^12 clips):
- the input is explicitly repartitioned to the session's default
  parallelism before the scan-heavy UDF pass, so one skewed/small
  input file can't serialize the stage;
- `bytes` is consumed HERE (fingerprint + sha256) and dropped; the
  binary payload never crosses a shuffle (SURVEY.md §7.3). Final PCM
  verification re-joins bytes for surviving candidate pairs only;
- band hashes are computed inside the pass (the MinHash signature is
  never materialized as a column) to keep shuffle width small.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DedupConfig
from ..functions import audio as A
from ..functions import hashing as H
from ..functions import text as X

SIGNED_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("sr_hz", T.IntegerType()),
    T.StructField("dur_ms", T.IntegerType()),
    T.StructField("codec", T.StringType()),
    T.StructField("transcript", T.StringType()),
    T.StructField("transcript_norm", T.StringType()),
    T.StructField("n_tokens", T.IntegerType()),
    T.StructField("sha_bytes", T.StringType()),
    T.StructField("pcm_fp", T.LongType()),
    T.StructField("band_hashes", T.ArrayType(T.LongType())),
    T.StructField("fp_bands", T.ArrayType(T.LongType())),
    T.StructField("lgram_hashes", T.ArrayType(T.LongType())),
    # distinct 64-bit shingle hashes (int64 bit-view of the uint64
    # minhash input): lets the edges stage compute EXACT shingle
    # Jaccard as JVM codegen size(array_intersect)/size(array_union)
    # instead of re-tokenizing + re-shingling both transcripts inside a
    # Python UDF per pair (VERDICT r3 #4 — the edges stage's largest
    # Python kernel). A 2^-64 hash collision can only merge two
    # distinct shingles, nudging Jaccard the same way for every pair
    # that contains both — pair-for-pair equality with the string-set
    # kernel is pinned by tests/test_verify_jaccard.py.
    T.StructField("shingle_hashes", T.ArrayType(T.LongType())),
])


def _i64_shingle_set(hh) -> list[int]:
    """uint64 shingle hashes -> the canonical `shingle_hashes` value:
    distinct hashes as a bit-preserving int64 view, sorted by uint64
    value. Every producer of the column goes through here."""
    if hh is None or not len(hh):
        return []
    return np.unique(hh).view(np.int64).tolist()


def shingle_hash_set(norm: str, k: int) -> list[int]:
    """Canonical `signed.shingle_hashes` for one NORMALIZED transcript.

    Single source of truth for the stored representation: the fused
    signature scan (`_sign_batch`), the pre-r4 workdir migration
    (`migrate_signed`), and the pair-for-pair Jaccard equality tests
    all share this chain, so the tests pin the production kernel
    rather than a private re-implementation drifting beside it."""
    sh = X.shingles(X.tokenize(norm or ""), k)
    return _i64_shingle_set(H.hash_strs_u64(sh) if sh else None)


def _sign_batch(pdf: pd.DataFrame, cfg: DedupConfig,
                a_coef, b_coef) -> pd.DataFrame:
    n_fp_bands = cfg.simhash_hamming_k + 1
    norms, ntoks, shas, fps, bands_l, fpb_l, lgr_l = [], [], [], [], [], [], []
    shh_l: list[list[int]] = []
    norm_cache: dict[str, str] = {}
    for raw_txt, data, sr_hz in zip(pdf["transcript"], pdf["bytes"], pdf["sr_hz"]):
        key = raw_txt or ""
        norm = norm_cache.get(key)
        if norm is None:
            norm = X.normalize_text(key)
            norm_cache[key] = norm
        toks = X.tokenize(norm)
        norms.append(norm)
        ntoks.append(len(toks))

        sh = X.shingles(toks, cfg.shingle_k)
        if sh:
            hh = H.hash_strs_u64(sh)
            sig = H.minhash_signature(hh, a_coef, b_coef)
            bands_l.append([int(v) for v in H.band_hashes(sig, cfg.lsh_bands)])
            # distinct SET of shingle hashes (reuses the minhash
            # input hh — no second hashing pass; same representation
            # as shingle_hash_set by construction)
            shh_l.append(_i64_shingle_set(hh))
        else:
            bands_l.append([])
            shh_l.append([])

        lg = []
        seen: set[int] = set()
        for g in X.grams(toks, cfg.substring_min_tokens):
            h = H.hash_str_u64(g)
            if h >= 1 << 63:
                h -= 1 << 64
            if h not in seen:
                seen.add(h)
                lg.append(h)
        lgr_l.append(lg)

        if data is None:
            shas.append(None)
            fps.append(None)
            fpb_l.append(None)
            continue
        b = bytes(data)
        shas.append(hashlib.sha256(b).hexdigest())
        try:
            pcm, sr_real = A.decode_wav(b)
            fp = A.pcm_fingerprint_spectral(
                pcm, sr_real or int(sr_hz), cfg.fp_time_frames,
                cfg.fp_freq_bands, cfg.fp_fmin_hz, cfg.fp_fmax_hz)
            fps.append(fp)
            fpb_l.append(H.simhash_bands(fp, n_fp_bands))
        except Exception:
            fps.append(None)
            fpb_l.append(None)

    return pd.DataFrame({
        "clip_id": pdf["clip_id"],
        "sr_hz": pdf["sr_hz"],
        "dur_ms": pdf["dur_ms"],
        "codec": pdf["codec"],
        "transcript": pdf["transcript"],
        "transcript_norm": norms,
        "n_tokens": pd.array(ntoks, dtype="int32"),
        "sha_bytes": shas,
        "pcm_fp": pd.array(fps, dtype="Int64"),
        "band_hashes": bands_l,
        "fp_bands": fpb_l,
        "lgram_hashes": lgr_l,
        "shingle_hashes": shh_l,
    })


def add_signatures(clips: DataFrame, cfg: DedupConfig,
                   n_partitions: int | None = None) -> DataFrame:
    """clips -> signed table (one Arrow pass; drops `bytes`)."""
    spark = clips.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        a_coef, b_coef = H.minhash_params(cfg.num_perm, cfg.minhash_seed)
        for pdf in batches:
            yield _sign_batch(pdf, cfg, a_coef, b_coef)

    # only shuffle the binary payload if the scan itself is too coarse
    # to keep the cores busy (small row groups / many files avoid this)
    src = clips
    if clips.rdd.getNumPartitions() < max(2, n // 2):
        src = clips.repartition(n)
    return src.mapInPandas(_run, schema=SIGNED_SCHEMA)


def migrate_signed(signed: DataFrame, cfg: DedupConfig) -> DataFrame | None:
    """Bring a stored `signed` table written by a pre-r4 layout (no
    `shingle_hashes` column) up to SIGNED_SCHEMA, or return None if it
    is already current.

    The column derives purely from `transcript_norm` (which every
    layout stores), so the migration is one text-only Arrow pass — no
    audio payload re-decode, no re-scan of the clips source. Without
    it, resume and run_incremental on an old workdir crash in the
    edges stage, and CheckpointStore.append (which aligns new rows to
    the EXISTING table's columns) would silently re-drop the column
    forever. The caller must REWRITE the stage table with the result
    (see DedupPipeline._signed_current), not just use it in-flight."""
    if "shingle_hashes" in signed.columns:
        return None
    k = cfg.shingle_k

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _shh(norm: pd.Series) -> pd.Series:
        return pd.Series([shingle_hash_set(s, k) for s in norm],
                         dtype=object)

    out = signed.withColumn("shingle_hashes", _shh(F.col("transcript_norm")))
    return out.select(*[f.name for f in SIGNED_SCHEMA])
