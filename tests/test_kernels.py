"""Unit tests for the deterministic kernels (SURVEY.md §5 plan item 1).

Golden-value style mirrors the reference's normalize goldens
(/root/reference/tests/test_preprocess.py:9-16).
"""

import numpy as np
import pytest

from record_deduplication_spark.config import DedupConfig
from record_deduplication_spark.functions import audio as A
from record_deduplication_spark.functions import hashing as H
from record_deduplication_spark.functions import text as X
from record_deduplication_spark.functions.suffix_array import (
    lcp_array, longest_common_run, suffix_array)


# ---------- text ----------

def test_normalize_goldens():
    assert X.normalize_text("The ACME, Inc.") == "the acme inc"
    assert X.normalize_text("  Héllo\tWörld!! ") == "hello world"
    assert X.normalize_text("株式会社") == ""  # non-latin folds away (ascii fold)
    assert X.normalize_text(None) == ""
    assert X.normalize_text("a  b   c") == "a b c"


def test_shingles():
    toks = "a b c d e".split()
    assert X.shingles(toks, 3) == ["a b c", "b c d", "c d e"]
    assert X.shingles(["a", "b"], 3) == ["a b"]  # short doc -> whole doc
    assert X.shingles([], 3) == []


def test_grams():
    toks = list("abcdefgh")
    assert len(X.grams(toks, 8)) == 1
    assert X.grams(toks, 9) == []


def test_jaccard():
    assert X.jaccard({"a", "b"}, {"a", "b"}) == 1.0
    assert X.jaccard({"a"}, {"b"}) == 0.0
    assert X.jaccard(set(), set()) == 0.0
    assert X.jaccard({"a", "b", "c"}, {"b", "c", "d"}) == pytest.approx(0.5)


# ---------- hashing ----------

def test_hash_stability():
    # must be stable across processes/runs (no PYTHONHASHSEED dependence)
    assert H.hash_str_u64("alpha") == H.hash_str_u64("alpha")
    assert H.hash_str_u64("alpha") != H.hash_str_u64("beta")
    h = H.hash_strs_u64(["alpha", "beta", "alpha"])
    assert h[0] == h[2] and h[0] != h[1]


def test_minhash_jaccard_estimate():
    cfg = DedupConfig(num_perm=256, lsh_bands=32)
    a_coef, b_coef = H.minhash_params(cfg.num_perm, cfg.minhash_seed)
    s1 = set(X.shingles([f"w{i}" for i in range(100)], 3))
    s2 = set(X.shingles([f"w{i}" for i in range(5, 105)], 3))
    true_j = X.jaccard(s1, s2)
    sig1 = H.minhash_signature(H.hash_strs_u64(sorted(s1)), a_coef, b_coef)
    sig2 = H.minhash_signature(H.hash_strs_u64(sorted(s2)), a_coef, b_coef)
    est = float((sig1 == sig2).mean())
    assert abs(est - true_j) < 0.12


def test_minhash_identical_sets_identical_sigs():
    a_coef, b_coef = H.minhash_params(64, 42)
    hh = H.hash_strs_u64(["x y z", "y z w"])
    s1 = H.minhash_signature(hh, a_coef, b_coef)
    s2 = H.minhash_signature(hh[::-1].copy(), a_coef, b_coef)  # order-invariant
    assert (s1 == s2).all()
    bh1, bh2 = H.band_hashes(s1, 16), H.band_hashes(s2, 16)
    assert (bh1 == bh2).all()


def test_simhash_similar_bags_close():
    base = [f"tok{i}" for i in range(200)]
    h1 = H.hash_strs_u64(base)
    h2 = H.hash_strs_u64(base[:-5] + ["a", "b", "c", "d", "e"])
    d = H.hamming64(H.simhash64(h1), H.simhash64(h2))
    assert d <= 12
    h3 = H.hash_strs_u64([f"other{i}" for i in range(200)])
    assert H.hamming64(H.simhash64(h1), H.simhash64(h3)) > 12


def test_simhash_bands_pigeonhole():
    fp1 = H.simhash64(H.hash_strs_u64([f"t{i}" for i in range(50)]))
    fp2 = fp1 ^ (1 << 3) ^ (1 << 40) ^ (1 << 63)  # hamming 3
    if fp2 >= 1 << 63:
        fp2 -= 1 << 64
    b1, b2 = H.simhash_bands(fp1, 4), H.simhash_bands(fp2, 4)
    assert any(x == y for x, y in zip(b1, b2))  # k+1=4 bands catch hamming<=3


# ---------- audio ----------

def test_wav_roundtrip():
    rng = np.random.default_rng(0)
    pcm = rng.uniform(-0.5, 0.5, 16000)
    data = A.encode_wav(pcm, 16000)
    out, sr = A.decode_wav(data)
    assert sr == 16000 and out.size == 16000
    assert float(np.abs(out - pcm).max()) < 1e-3  # 16-bit quantization


def test_fingerprint_noise_invariance():
    rng = np.random.default_rng(1)
    t = np.arange(16000) / 16000.0
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))
    fp1 = A.pcm_fingerprint(sig)
    noisy = sig + rng.normal(0, np.sqrt(float((sig ** 2).mean()) / 10 ** 3.6), sig.size)
    fp2 = A.pcm_fingerprint(noisy)  # SNR 36dB
    assert H.hamming64(fp1, fp2) <= 3
    other = 0.4 * np.sin(2 * np.pi * 250 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 7 * t + 1))
    assert H.hamming64(fp1, A.pcm_fingerprint(other)) > 3


def test_fingerprint_resample_invariance():
    t = np.arange(44100) / 44100.0
    sig = 0.4 * np.sin(2 * np.pi * 300 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 1.5 * t))
    lo = A.resample_linear(sig, 44100, 16000)
    assert H.hamming64(A.pcm_fingerprint(sig), A.pcm_fingerprint(lo)) <= 3


def test_snr():
    rng = np.random.default_rng(2)
    sig = rng.uniform(-0.5, 0.5, 8000)
    assert A.snr_db(sig, sig) == float("inf")
    p = float((sig ** 2).mean())
    noisy = sig + rng.normal(0, np.sqrt(p / 10 ** 3.5), sig.size)
    ok, s = A.pcm_allclose_snr(sig, 8000, noisy, 8000, 30.0)
    assert ok and 30 < s < 40


# ---------- suffix array ----------

def test_suffix_array_banana():
    seq = np.array([ord(c) for c in "banana"], dtype=np.int64)
    sa = suffix_array(seq)
    assert sa.tolist() == [5, 3, 1, 0, 4, 2]
    lcp = lcp_array(seq, sa)
    assert lcp.tolist() == [0, 1, 3, 0, 0, 2]


def test_longest_common_run():
    a = "the quick brown fox jumps over the lazy dog".split()
    b = "a quick brown fox jumps over the river".split()
    assert longest_common_run(a, b) == 6  # "quick brown fox jumps over the"
    assert longest_common_run(a, ["zebra"]) == 0
    assert longest_common_run([], a) == 0
    assert longest_common_run(a, a) == len(a)


def test_jaro_winkler_golden():
    """Classic textbook values (Winkler 1990)."""
    from record_deduplication_spark.functions.text import jaro, jaro_winkler
    assert jaro("MARTHA", "MARHTA") == pytest.approx(0.944444, abs=1e-6)
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.961111, abs=1e-6)
    assert jaro("DIXON", "DICKSONX") == pytest.approx(0.766667, abs=1e-6)
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.813333, abs=1e-6)
    assert jaro_winkler("", "x") == 0.0
    assert jaro_winkler("same", "same") == 1.0
    assert 0.0 <= jaro_winkler("abc", "xyz") <= 1.0


def test_snr_prefix_clip_is_not_a_duplicate():
    """A clip that is a mere prefix of another must NOT pass the
    allclose-SNR dup criterion: the unmatched tail counts as error
    (truncate-to-min alignment scored such pairs +inf)."""
    import numpy as np
    from record_deduplication_spark.functions.audio import (
        pcm_allclose_snr, snr_db)
    rng = np.random.default_rng(11)
    full = rng.uniform(-0.5, 0.5, 16000)
    prefix = full[:1000].copy()
    ok, s = pcm_allclose_snr(prefix, 16000, full, 16000)
    assert not ok and s < 30, (ok, s)
    # identical signals still score +inf; tiny resample rounding is fine
    assert snr_db(full, full) == float("inf")
    ok2, s2 = pcm_allclose_snr(full, 16000, full[:15999], 16000)
    assert ok2  # 1-sample tail = negligible error, not a rejection
