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


def resample_clips(clips: DataFrame, target_sr: int,
                   allow_fake: bool = False) -> DataFrame:
    """Resize analog for audio: re-encode every payload at `target_sr`
    (linear-interpolation resample, functions/audio.resample_linear).

    Same schema out as in — (clip_id, bytes, sr_hz, dur_ms, codec) —
    so the result drops into any pipeline stage. One mapInPandas pass;
    the binary column is consumed and re-emitted inside the task,
    never shuffled (write the result to a table rather than joining it
    wide). Already-at-rate clips pass through byte-identical."""
    out_schema = T.StructType([
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ])

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("clip_id", "bytes", "sr_hz",
                                    "dur_ms", "codec")}
            for cid, codec, data, sr in zip(pdf["clip_id"], pdf["codec"],
                                            pdf["bytes"], pdf["sr_hz"]):
                b = bytes(data) if data is not None else b""
                try:
                    pcm, sr_in = decode_codec(codec, b)
                    out_codec = codec
                except NotImplementedError:
                    if not allow_fake:
                        raise
                    pcm, sr_in = _fake_decode(b), int(sr)
                    out_codec = "pcm_s16le"  # fake decodes re-encode as wav
                if sr_in == target_sr and out_codec == codec:
                    enc = b
                elif pcm.size == 0:
                    # zero-frame clip: re-header at the target rate
                    # (resample_linear's np.interp needs >=1 sample)
                    enc = A.encode_wav(pcm, target_sr)
                else:
                    enc = A.encode_wav(
                        A.resample_linear(pcm, sr_in, target_sr), target_sr)
                rows["clip_id"].append(cid)
                rows["bytes"].append(enc)
                rows["sr_hz"].append(target_sr)
                rows["dur_ms"].append(int(round(
                    1000.0 * (pcm.size / sr_in))) if sr_in else 0)
                rows["codec"].append(out_codec)
            yield pd.DataFrame(rows)

    return (clips.select("clip_id", "codec", "bytes", "sr_hz")
            .mapInPandas(_resample, schema=out_schema))


FRAME_SCHEMA = T.StructType([
    T.StructField("clip_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("start_ms", T.IntegerType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("zcr", T.DoubleType()),  # zero-crossing rate
])


def sample_frames(clips: DataFrame, frame_ms: int = 1000,
                  hop_ms: int | None = None,
                  allow_fake: bool = True) -> DataFrame:
    """Frame-sample analog (video frame extraction ≙ audio windowing):
    one row per `frame_ms` window at `hop_ms` stride with per-window
    features. The explode happens INSIDE the task on the decoded
    floats — the payload itself never multiplies; output rows are a
    few doubles each, safe to shuffle/aggregate downstream.

    Every emitted row covers exactly `frame_ms` of audio: clips
    shorter than one frame produce NO rows (the r2 version emitted a
    silently-truncated window whose rms/peak/zcr covered fewer samples
    than the requested width — ADVICE r2)."""
    hop = hop_ms or frame_ms

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("clip_id", "frame_idx", "start_ms",
                                    "rms", "peak", "zcr")}
            for cid, codec, data, sr in zip(pdf["clip_id"], pdf["codec"],
                                            pdf["bytes"], pdf["sr_hz"]):
                b = bytes(data) if data is not None else b""
                try:
                    pcm, sr_in = decode_codec(codec, b)
                except NotImplementedError:
                    if not allow_fake:
                        raise
                    pcm, sr_in = _fake_decode(b), int(sr)
                win = max(1, int(sr_in * frame_ms / 1000))
                step = max(1, int(sr_in * hop / 1000))
                if pcm.size < win:
                    continue  # shorter than one frame: no FULL window
                for i, s in enumerate(range(0, pcm.size - win + 1, step)):
                    seg = pcm[s:s + win]
                    rows["clip_id"].append(cid)
                    rows["frame_idx"].append(i)
                    rows["start_ms"].append(int(s * 1000 / sr_in))
                    rows["rms"].append(float(np.sqrt((seg ** 2).mean())))
                    rows["peak"].append(float(np.abs(seg).max()))
                    rows["zcr"].append(float(
                        (np.diff(np.signbit(seg)) != 0).mean()) if seg.size > 1
                        else 0.0)
            yield pd.DataFrame(rows)

    return (clips.select("clip_id", "codec", "bytes", "sr_hz")
            .mapInPandas(_frames, schema=FRAME_SCHEMA))


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


def preprocess_clips(clips: DataFrame, *, trim_db: float | None = -40.0,
                     target_rms: float | None = 0.1,
                     allow_fake: bool = False) -> DataFrame:
    """Audio ETL pass: optional silence trim + loudness normalization,
    re-encoded in place (same clips schema out, like resample_clips —
    one mapInPandas task consumes and re-emits the payload, binary
    never shuffles). All-silent clips come back with 0 samples /
    dur_ms 0 rather than disappearing, so lineage row counts hold."""
    out_schema = T.StructType([
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
    ])

    def _prep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("clip_id", "bytes", "sr_hz",
                                    "dur_ms", "codec")}
            for cid, codec, data, sr in zip(pdf["clip_id"], pdf["codec"],
                                            pdf["bytes"], pdf["sr_hz"]):
                b = bytes(data) if data is not None else b""
                try:
                    pcm, sr_in = decode_codec(codec, b)
                    out_codec = codec
                except NotImplementedError:
                    if not allow_fake:
                        raise
                    pcm, sr_in = _fake_decode(b), int(sr)
                    out_codec = "pcm_s16le"
                if trim_db is not None:
                    pcm = A.trim_silence(pcm, sr_in, threshold_db=trim_db)
                if target_rms is not None:
                    pcm = A.normalize_rms(pcm, target_rms=target_rms)
                rows["clip_id"].append(cid)
                rows["bytes"].append(A.encode_wav(pcm, sr_in))
                rows["sr_hz"].append(int(sr_in))
                rows["dur_ms"].append(int(round(1000.0 * pcm.size / sr_in))
                                      if sr_in else 0)
                rows["codec"].append(out_codec)
            yield pd.DataFrame(rows)

    return (clips.select("clip_id", "codec", "bytes", "sr_hz")
            .mapInPandas(_prep, schema=out_schema))
