"""Text normalization + shingling kernels.

Numpy/pandas kernels shared by the oracle and by the Spark
pandas_udfs in ``operators/signatures.py``. Semantics mirror the
reference's normalize step (NFKD unicode fold -> ascii, lowercase,
punctuation -> space, whitespace collapse;
/root/reference/src/core/preprocess_engine.py:58-78) applied to
transcripts instead of company names.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd

_WS_RE = re.compile(r"\s+")
_PUNCT_RE = re.compile(r"[^a-z0-9 ]+")


def normalize_text(s: str | None) -> str:
    """NFKD fold -> ascii, lowercase, punct->space, collapse whitespace."""
    if s is None:
        return ""
    s = unicodedata.normalize("NFKD", s)
    s = s.encode("ascii", "ignore").decode("ascii").lower()
    s = _PUNCT_RE.sub(" ", s)
    return _WS_RE.sub(" ", s).strip()


def normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized-ish normalize: python fn per unique value (dedup first)."""
    uniq = s.dropna().unique()
    mapping = {u: normalize_text(u) for u in uniq}
    return s.map(mapping).fillna("")


def tokenize(norm: str) -> list[str]:
    return norm.split() if norm else []


def shingles(tokens: list[str], k: int) -> list[str]:
    """Word k-shingles; a doc shorter than k tokens yields one shingle
    (the whole doc) so short docs still participate in MinHash."""
    n = len(tokens)
    if n == 0:
        return []
    if n < k:
        return [" ".join(tokens)]
    return [" ".join(tokens[i : i + k]) for i in range(n - k + 1)]


def grams(tokens: list[str], L: int) -> list[str]:
    """Contiguous L-token runs (for the exact-substring stage). A doc
    shorter than L tokens yields none: it cannot contain/share an
    L-token run."""
    n = len(tokens)
    if n < L:
        return []
    return [" ".join(tokens[i : i + L]) for i in range(n - L + 1)]


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 0.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def jaro(a: str, b: str) -> float:
    """Jaro similarity in [0, 1] (F1 kernel; the reference scores
    company names with recordlinkage's jarowinkler —
    /root/reference/src/core/similarity_engine.py:76-78)."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    match_a = [False] * la
    match_b = [False] * lb
    m = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = match_b[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4,
                 boost_threshold: float = 0.7) -> float:
    """Jaro-Winkler: Jaro boosted by shared prefix (standard p=0.1).

    The prefix boost applies only when jaro(a, b) >= boost_threshold
    (Winkler's 0.7 rule — matches jellyfish/recordlinkage, which is
    what the reference scores with at
    /root/reference/src/core/similarity_engine.py:76-78; boosting
    low-similarity pairs would shift threshold comparability)."""
    sim = jaro(a, b)
    if sim < boost_threshold:
        return sim
    prefix = 0
    for ca, cb in zip(a[:max_prefix], b[:max_prefix]):
        if ca != cb:
            break
        prefix += 1
    return sim + prefix * p * (1.0 - sim)
