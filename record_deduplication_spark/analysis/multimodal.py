"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with metadata columns
(our clips table IS the audio instance: bytes + sr_hz/dur_ms/codec).
The WAV path is fully real (functions/audio.py). Codec decode for
flac/mp3/opus and image/video feature extraction are STUBBED — the
decode libraries are not in this container — behind
NotImplementedError or a clearly-marked deterministic fake, while the
Spark-side plumbing (schema, batch shape, mapInPandas signature,
partition hygiene for binary columns) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import audio as A

REAL_CODECS = {"pcm_s16le", "wav"}

FEATURE_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("codec", T.StringType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("frames", T.ArrayType(T.DoubleType())),  # per-frame RMS envelope
    T.StructField("decoded_real", T.BooleanType()),
])


def decode_codec(codec: str, data: bytes) -> tuple[np.ndarray, int]:
    """Decode an encoded payload to PCM. Only the WAV container is
    implemented in-container; other codecs raise (the cluster build
    would plug ffmpeg/soundfile here)."""
    if codec in REAL_CODECS:
        return A.decode_wav(data)
    raise NotImplementedError(
        f"codec {codec!r}: decoder library not available in this environment")


def _fake_decode(data: bytes, n: int = 4096) -> np.ndarray:
    """Deterministic fake used when the real decoder is unavailable:
    pseudo-PCM seeded by the payload hash. CLEARLY A STUB — keeps batch
    shapes/partitioning real for plumbing tests without audio libs."""
    seed = int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return rng.uniform(-0.5, 0.5, n)


def extract_audio_features(clips: DataFrame, n_frames: int = 16,
                           allow_fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over the binary column.

    Batch shape: Arrow batches of (clip_id, codec, bytes); output drops
    the payload (binary never crosses downstream shuffles)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("clip_id", "codec", "n_samples", "rms",
                                    "peak", "frames", "decoded_real")}
            for cid, codec, data in zip(pdf["clip_id"], pdf["codec"], pdf["bytes"]):
                b = bytes(data) if data is not None else b""
                try:
                    pcm, _ = decode_codec(codec, b)
                    real = True
                except NotImplementedError:
                    if not allow_fake:
                        raise
                    pcm = _fake_decode(b)
                    real = False
                usable = (pcm.size // n_frames) * n_frames
                fr = (pcm[:usable].reshape(n_frames, -1) ** 2).mean(axis=1) ** 0.5 \
                    if usable else np.zeros(n_frames)
                rows["clip_id"].append(cid)
                rows["codec"].append(codec)
                rows["n_samples"].append(int(pcm.size))
                rows["rms"].append(float(np.sqrt((pcm ** 2).mean())) if pcm.size else 0.0)
                rows["peak"].append(float(np.abs(pcm).max()) if pcm.size else 0.0)
                rows["frames"].append([float(x) for x in fr])
                rows["decoded_real"].append(real)
            yield pd.DataFrame(rows)

    return (clips
            .select("clip_id", "codec", "bytes")
            .mapInPandas(_extract, schema=FEATURE_SCHEMA))


def payload_stats(clips: DataFrame) -> DataFrame:
    """Pure-expression metadata pass over the binary column (no Python):
    payload sizes and integrity hash by codec."""
    return (clips
            .groupBy("codec")
            .agg(F.count(F.lit(1)).alias("n_clips"),
                 F.sum(F.length("bytes").cast("bigint")).alias("total_bytes"),
                 F.min("sr_hz").alias("min_sr"),
                 F.max("sr_hz").alias("max_sr"),
                 F.count_distinct(F.sha2("bytes", 256)).alias("distinct_payloads")))
