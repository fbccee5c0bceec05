"""Audio kernels: in-memory WAV encode/decode, PCM fingerprints, SNR.

Pure stdlib (`wave`) + numpy — no external codec libraries (container
has none). Real codecs (flac/mp3) are represented by the `codec`
label column; their decode path is stubbed in
``analysis/multimodal.py`` behind NotImplementedError while the
Spark-side plumbing (binary column, batch shape, UDF signature) is
real and tested.

The per-row invariant vs the reference (BASELINE.json `input_hint`):
decoded-PCM allclose at SNR>=30dB + transcript equality.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(pcm: np.ndarray, sr_hz: int) -> bytes:
    """Encode float PCM in [-1, 1] (or int16) to mono 16-bit WAV bytes."""
    if pcm.dtype != np.int16:
        pcm = np.clip(pcm, -1.0, 1.0)
        pcm = (pcm * 32767.0).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr_hz)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode mono 16-bit WAV bytes -> (float64 PCM in [-1,1], sr_hz)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    pcm = np.frombuffer(raw, dtype=np.int16).astype(np.float64) / 32767.0
    return pcm, sr


def resample_linear(pcm: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Deterministic linear resampling (datagen + alignment helper)."""
    if sr_from == sr_to:
        return pcm
    n_out = int(round(len(pcm) * sr_to / sr_from))
    x_out = np.linspace(0.0, len(pcm) - 1, n_out)
    return np.interp(x_out, np.arange(len(pcm)), pcm)


def pcm_fingerprint(pcm: np.ndarray, n_frames: int = 64) -> int:
    """64-bit energy-envelope fingerprint of a PCM signal.

    Split into ``n_frames`` equal frames; bit_i = (frame RMS energy >
    median energy). Invariant to sample rate (frames are relative
    positions), amplitude scaling, and additive noise well below the
    signal (SNR>=30dB perturbs energies by ~0.1%). This is the "SimHash
    over decoded-PCM fingerprints" per the north rule: a locality-
    sensitive 64-bit code compared by Hamming distance.
    """
    if pcm.size < n_frames:
        pcm = np.pad(pcm, (0, n_frames - pcm.size))
    usable = (pcm.size // n_frames) * n_frames
    frames = pcm[:usable].reshape(n_frames, -1)
    energy = (frames * frames).mean(axis=1)
    med = np.median(energy)
    bits = energy > med
    fp = 0
    for i in range(n_frames):
        if bits[i]:
            fp |= 1 << i
    if fp >= 1 << 63:
        fp -= 1 << 64
    return fp


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """SNR of `test` against `ref` after length alignment (truncate to
    min length). Returns +inf for exact match, -inf for empty."""
    n = min(ref.size, test.size)
    if n == 0:
        return float("-inf")
    r, t = ref[:n], test[:n]
    num = float((r * r).sum())
    den = float(((r - t) ** 2).sum())
    if den == 0.0:
        return float("inf")
    if num == 0.0:
        return float("-inf")
    return 10.0 * np.log10(num / den)


def pcm_allclose_snr(pcm_a: np.ndarray, sr_a: int, pcm_b: np.ndarray, sr_b: int,
                     snr_min_db: float = 30.0) -> tuple[bool, float]:
    """Per-row invariant check: resample b to a's rate, compare SNR.

    Tries both polarities of which side is 'reference' and takes the max
    (SNR is asymmetric in the denominator's favor).
    """
    if sr_a != sr_b:
        pcm_b = resample_linear(pcm_b, sr_b, sr_a)
    s = max(snr_db(pcm_a, pcm_b), snr_db(pcm_b, pcm_a))
    return bool(s >= snr_min_db), float(s)
