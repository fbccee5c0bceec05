"""Stable hashing kernels: token hashes, MinHash, SimHash, band hashes.

All deterministic across processes (blake2b-based; no PYTHONHASHSEED
dependence) and shared verbatim by the oracle and the Spark
pandas_udfs — recall parity at identical config is by construction
(SURVEY.md §7.3 "Recall parity with the oracle").
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE31 = np.uint64((1 << 31) - 1)  # modulus for universal hashing
_U64 = np.uint64


def hash_str_u64(s: str, salt: bytes = b"") -> int:
    """Stable 64-bit hash of a string (blake2b, little-endian)."""
    h = hashlib.blake2b(s.encode("utf-8"), digest_size=8, salt=salt[:16].ljust(16, b"\0") if salt else b"")
    return int.from_bytes(h.digest(), "little")


def hash_strs_u64(strs: list[str]) -> np.ndarray:
    """Vectorized-by-uniques 64-bit hashes for a token/shingle list."""
    if not strs:
        return np.empty(0, dtype=np.uint64)
    cache: dict[str, int] = {}
    out = np.empty(len(strs), dtype=np.uint64)
    for i, s in enumerate(strs):
        v = cache.get(s)
        if v is None:
            v = hash_str_u64(s)
            cache[s] = v
        out[i] = v
    return out


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) universal-hash coefficients over the 31-bit Mersenne field."""
    rng = np.random.default_rng(seed)
    p = int(_MERSENNE31)
    a = rng.integers(1, p, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, p, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (num_perm,) int64 in [0, 2^31).

    h31 = h64 & (2^31-1); sig_i = min_j (a_i * h31_j + b_i) mod p.
    a_i*h31 < 2^62 so uint64 arithmetic is exact.
    Empty input -> all p (sentinel max, never collides with real sigs
    in a band unless both empty; empty transcripts are filtered before
    LSH anyway).
    """
    p = _MERSENNE31
    if shingle_hashes.size == 0:
        return np.full(a.shape[0], int(p), dtype=np.int64)
    h31 = shingle_hashes & p
    sig = (a[:, None] * h31[None, :] + b[:, None]) % p
    return sig.min(axis=1).astype(np.int64)


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """Collapse a (num_perm,) signature into (bands,) int64 band keys.

    Polynomial combine of each band's rows (exact uint64 wraparound —
    identical in oracle and Spark since both run this numpy code).
    """
    rows = sig.shape[0] // bands
    m = sig.astype(np.uint64).reshape(bands, rows)
    acc = np.zeros(bands, dtype=np.uint64)
    mult = _U64(1099511628211)  # FNV-ish odd multiplier
    with np.errstate(over="ignore"):
        for r in range(rows):
            acc = acc * mult + m[:, r] + _U64(0x9E3779B97F4A7C15)
    return acc.view(np.int64)


def simhash64(hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of a bag of 64-bit element hashes."""
    if hashes.size == 0:
        return 0
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((hashes[:, None] >> shifts[None, :]) & _U64(1)).astype(np.float64)
    signs = bits * 2.0 - 1.0
    if weights is not None:
        signs *= weights[:, None]
    v = signs.sum(axis=0)
    fp = 0
    for i in range(64):
        if v[i] > 0:
            fp |= 1 << i
    if fp >= 1 << 63:  # reinterpret as signed int64 (Spark LongType)
        fp -= 1 << 64
    return fp


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & ((1 << 64) - 1)).count("1"))


def simhash_bands(fp: int, n_bands: int) -> list[int]:
    """Split a 64-bit fingerprint into n_bands contiguous chunks.

    Pigeonhole: two fingerprints at Hamming distance <= n_bands-1 share
    at least one identical band -> exact-match blocking on
    (band_idx, band_value) is recall-complete for Hamming <= n_bands-1.
    """
    u = fp & ((1 << 64) - 1)
    w = 64 // n_bands
    mask = (1 << w) - 1
    return [(u >> (i * w)) & mask for i in range(n_bands)]
