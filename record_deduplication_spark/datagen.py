"""Deterministic synthetic `clips` corpus with planted duplicate groups.

Schema is exactly the north rule's input_hint (BASELINE.json):
    clip_id:string, bytes:binary, sr_hz:int, dur_ms:int,
    codec:string, transcript:string
plus a ground-truth table `clusters_truth(clip_id, cluster_id)`.

Planted groups (FIXTURES.md §A):
  - exact dup          identical bytes + transcript
  - audio near-dup     additive noise at SNR>=30dB, same transcript
                       (cross-sample-rate pairs are NOT planted here —
                       the resample alignment path is covered by unit
                       tests on pcm_allclose_snr/resample_clips; mixed
                       rates DO occur across clips via the 3-rate pool)
  - transcript near-dup  <=k token edits, same audio
  - substring dup      one transcript embedded verbatim (>=L tokens) in a longer one
  - hot-key group      one large group of near-identical transcripts (skew/salting exercise)
  - negatives          unrelated audio + transcripts; adversarial negatives share a
                       few shingles but sit below the Jaccard threshold
  - singletons         cluster label -1 (reference noise convention,
                       /root/reference/src/core/clustering_engine.py:527-529)

Everything is keyed by (seed, base_id): re-running with the same seed
reproduces identical bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .functions.audio import encode_wav

# bump when generation logic changes: benchmark corpus caches key on it
DATAGEN_VERSION = 4

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu river mountain valley ocean forest desert meadow canyon "
    "harbor island plateau glacier lagoon prairie tundra savanna"
).split()

_SRS = (8000, 16000, 44100)
_CODECS = ("pcm_s16le", "flac", "mp3")


def _make_pcm(rng: np.random.Generator, sr: int, dur_ms: int) -> np.ndarray:
    n = int(sr * dur_ms / 1000)
    t = np.arange(n) / sr
    x = np.zeros(n)
    # per-tone envelopes (different rates/phases) so spectral bands
    # have independent time profiles — realistic audio has decorrelated
    # band dynamics, and the spectral fingerprint's entropy depends on it
    for _ in range(rng.integers(2, 6)):
        f = float(rng.uniform(80, min(3500, sr / 2 - 100)))
        amp = float(rng.uniform(0.1, 0.3))
        ph = float(rng.uniform(0, 2 * np.pi))
        env = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(0.3, 4.0) * t
                                   + rng.uniform(0, 6.28))
        x += amp * env * np.sin(2 * np.pi * f * t + ph)
    x += rng.normal(0, 0.004, n)  # floor noise, ~ -40dB
    return np.clip(x, -0.99, 0.99)


def _make_transcript(rng: np.random.Generator, n_words: int) -> str:
    return " ".join(_WORDS[i] for i in rng.integers(0, len(_WORDS), n_words))


def _add_noise_snr(rng: np.random.Generator, pcm: np.ndarray, snr_db: float) -> np.ndarray:
    p_sig = float((pcm * pcm).mean())
    p_noise = p_sig / (10 ** (snr_db / 10))
    return np.clip(pcm + rng.normal(0, np.sqrt(p_noise), pcm.size), -0.99, 0.99)


def _edit_tokens(rng: np.random.Generator, text: str, n_edits: int) -> str:
    toks = text.split()
    for _ in range(n_edits):
        if len(toks) < 4:
            break
        op = rng.integers(0, 3)
        i = int(rng.integers(0, len(toks)))
        if op == 0:
            toks[i] = _WORDS[int(rng.integers(0, len(_WORDS)))]
        elif op == 1:
            toks.insert(i, _WORDS[int(rng.integers(0, len(_WORDS)))])
        else:
            del toks[i]
    return " ".join(toks)


def generate_clips(n_clips: int = 2000, seed: int = 42,
                   hot_group_frac: float = 0.05,
                   dur_min_ms: int = 200,
                   dur_max_ms: int = 3000,
                   id_prefix: str = "c",
                   cluster_base: int = 0) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (clips_df, truth_df).

    truth cluster_id: non-negative int for planted multi-member groups,
    -1 for singletons/negatives.

    dur_min_ms/dur_max_ms size the clips: tests use the short default;
    the scaling benchmark uses multi-second clips so the per-clip
    decode+fingerprint compute dominates fixed per-job latency the way
    it does on real corpora (a 100 TB corpus is ~minutes of audio per
    clip, not 0.2-3 s).
    """
    rng = np.random.default_rng(seed)
    rows: list[dict] = []
    truth: list[tuple[str, int]] = []
    next_id = 0
    cluster = cluster_base

    def cid() -> str:
        nonlocal next_id
        s = f"{id_prefix}{next_id:09d}"
        next_id += 1
        return s

    def base_clip(n_words: int | None = None, dur_ms: int | None = None):
        sr = int(_SRS[int(rng.integers(0, 3))])
        dur = int(dur_ms if dur_ms is not None
                  else rng.integers(dur_min_ms, dur_max_ms))
        pcm = _make_pcm(rng, sr, dur)
        txt = _make_transcript(rng, int(n_words or rng.integers(6, 40)))
        return pcm, sr, dur, txt

    def emit(pcm, sr, dur, txt, cluster_id, codec=None):
        rows.append({
            "clip_id": cid(),
            "bytes": encode_wav(pcm, sr),
            "sr_hz": np.int32(sr),
            "dur_ms": np.int32(dur),
            "codec": codec or _CODECS[int(rng.integers(0, 3))],
            "transcript": txt,
        })
        truth.append((rows[-1]["clip_id"], cluster_id))

    n_hot = max(3, int(n_clips * hot_group_frac))
    n_groups = max(1, int(n_clips * 0.12) // 3)
    # NOTE: planted groups + hot group + adversarial negatives are
    # emitted unconditionally, so for very small n_clips (< ~15) the
    # corpus can exceed n_clips; the while-top-up below only ever adds.
    # Kept as-is deliberately — trimming would change every seeded
    # corpus (DATAGEN_VERSION bump) and all callers use n >= 40.

    # --- planted small groups: rotate through the 4 dup mechanisms ---
    for g in range(n_groups):
        kind = g % 4
        if kind == 1:
            # audio near-dup with EMPTY transcripts: the audio path must
            # be load-bearing (text LSH cannot see these clips at all).
            pcm, sr, dur, _ = base_clip()
            emit(pcm, sr, dur, "", cluster, codec="pcm_s16le")
            noisy = _add_noise_snr(rng, pcm, float(rng.uniform(36, 50)))
            emit(noisy, sr, dur, "", cluster, codec="pcm_s16le")
            emit(pcm, sr, dur, "", cluster, codec="pcm_s16le")  # exact bytes copy
        elif kind == 0:  # exact dup (x2 copies)
            pcm, sr, dur, txt = base_clip()
            emit(pcm, sr, dur, txt, cluster)
            emit(pcm, sr, dur, txt, cluster)
            emit(pcm, sr, dur, txt, cluster)
        elif kind == 2:  # transcript near-dup: 1 token edit on a long transcript
            pcm, sr, dur, txt = base_clip(n_words=int(rng.integers(25, 40)))
            emit(pcm, sr, dur, txt, cluster)
            txt2 = _edit_tokens(rng, txt, 1)
            emit(pcm, sr, dur, txt2, cluster)
        else:  # substring dup: txt embedded verbatim (>=L tokens) in a longer one
            pcm, sr, dur, txt = base_clip(n_words=int(rng.integers(10, 20)))
            emit(pcm, sr, dur, txt, cluster)
            pre = _make_transcript(rng, int(rng.integers(3, 8)))
            post = _make_transcript(rng, int(rng.integers(3, 8)))
            pcm2, sr2, dur2, _ = base_clip(dur_ms=dur)
            emit(pcm2, sr2, dur2, f"{pre} {txt} {post}", cluster)
        cluster += 1

    # --- hot-key group: near-identical long transcripts (skew exercise) ---
    pcm, sr, dur, txt = base_clip(n_words=30)
    for i in range(n_hot):
        # tiny tail variation: stays above Jaccard threshold, same LSH bands mostly
        t = txt if i % 3 == 0 else txt + " " + _WORDS[i % 5]
        emit(pcm, sr, dur, t, cluster, codec="pcm_s16le")
    cluster += 1

    # --- adversarial negatives: share a shingle prefix, below threshold ---
    n_adv = max(2, n_clips // 50)
    shared_prefix = _make_transcript(rng, 3)
    for _ in range(n_adv):
        pcm, sr, dur, txt = base_clip(n_words=25)
        emit(pcm, sr, dur, f"{shared_prefix} {txt}", -1)

    # --- plain negatives / singletons ---
    while len(rows) < n_clips:
        pcm, sr, dur, txt = base_clip()
        emit(pcm, sr, dur, txt, -1)

    clips = pd.DataFrame(rows)
    truth_df = pd.DataFrame(truth, columns=["clip_id", "cluster_id"])
    return clips, truth_df


def write_clips_parquet(out_dir: str, n_clips: int = 2000, seed: int = 42,
                        dur_min_ms: int = 200,
                        dur_max_ms: int = 3000) -> tuple[str, str]:
    """Materialize clips + truth as parquet; returns (clips_path, truth_path)."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    clips, truth = generate_clips(n_clips=n_clips, seed=seed,
                                  dur_min_ms=dur_min_ms, dur_max_ms=dur_max_ms)
    cp = os.path.join(out_dir, "clips.parquet")
    tp = os.path.join(out_dir, "clusters_truth.parquet")
    # small row groups so Spark's parquet scan can parallelize the
    # signature pass across cores WITHOUT a repartition shuffle of the
    # binary payload (row-group boundaries are the split points).
    # row_group_size=8 (~2.5 MB of payload): the payload table is a
    # point-lookup table — verify_audio re-fetches the few surviving
    # pair members by clip_id with a pushed In filter, and Spark's
    # vectorized reader prunes at ROW-GROUP granularity only (measured:
    # page indexes are written below, but the shipped reader does not
    # page-prune In predicates — fetch time was unchanged by them). At
    # 128-row (~40 MB) groups one 300 KB survivor dragged a whole
    # group; at 8 rows fetch IO is ~proportional to survivors while
    # sequential-scan throughput is unaffected (2.5 MB chunks are well
    # above IO-efficiency size). Same spec a production Iceberg audio
    # corpus would use for payload point reads.
    clips.to_parquet(cp, index=False, row_group_size=8,
                     write_page_index=True)
    truth.to_parquet(tp, index=False)
    return cp, tp


def _gen_shard(args: tuple) -> tuple[str, str]:
    (out_dir, i, n, seed, dur_min_ms, dur_max_ms) = args
    import os
    clips, truth = generate_clips(
        n_clips=n, seed=seed + i, dur_min_ms=dur_min_ms, dur_max_ms=dur_max_ms,
        id_prefix=f"s{i:02d}c", cluster_base=i * 10_000_000)
    cp = os.path.join(out_dir, "clips.parquet", f"part-{i:03d}.parquet")
    tp = os.path.join(out_dir, "clusters_truth.parquet", f"part-{i:03d}.parquet")
    clips.to_parquet(cp, index=False, row_group_size=8,
                     write_page_index=True)  # see write_clips_parquet
    truth.to_parquet(tp, index=False)
    return cp, tp


def write_clips_parquet_sharded(out_dir: str, n_clips: int, seed: int = 42,
                                dur_min_ms: int = 200, dur_max_ms: int = 3000,
                                n_shards: int = 10) -> tuple[str, str]:
    """Parallel corpus generation: `n_shards` independent deterministic
    shards (seed+i, disjoint id prefixes, disjoint cluster-id ranges)
    written as parts of a parquet DIRECTORY. Functionally equivalent to
    one big table for every consumer (Spark, pyarrow, oracle); ~10x
    faster to build for the multi-GB scaling corpora.
    """
    import os
    from multiprocessing import Pool
    os.makedirs(os.path.join(out_dir, "clips.parquet"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "clusters_truth.parquet"), exist_ok=True)
    per = [n_clips // n_shards] * n_shards
    per[0] += n_clips - sum(per)
    tasks = [(out_dir, i, per[i], seed, dur_min_ms, dur_max_ms)
             for i in range(n_shards)]
    with Pool(min(n_shards, os.cpu_count() or 4)) as p:
        p.map(_gen_shard, tasks)
    return (os.path.join(out_dir, "clips.parquet"),
            os.path.join(out_dir, "clusters_truth.parquet"))
