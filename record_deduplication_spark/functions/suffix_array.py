"""Suffix array over token sequences (rank-doubling, O(n log^2 n)).

Used by the exact-substring stage (SURVEY.md §7.3): candidate pairs
come from exact L-token-gram blocking; within a candidate bucket a
generalized suffix array over the concatenated token sequences
verifies and measures the longest shared contiguous token run.
Per-partition construction (inside applyInPandas) is the distribution
strategy — global suffix arrays don't distribute naturally.
"""

from __future__ import annotations

import numpy as np


def suffix_array(seq: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence (rank-doubling)."""
    n = seq.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(seq, return_inverse=True)[1].astype(np.int64)
    sa = np.argsort(rank, kind="stable").astype(np.int64)
    k = 1
    while k < n:
        # key = (rank[i], rank[i+k] or -1)
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        new_rank = np.zeros(n, dtype=np.int64)
        prev = order[0]
        r = 0
        for idx in order[1:]:
            if rank[idx] != rank[prev] or second[idx] != second[prev]:
                r += 1
            new_rank[idx] = r
            prev = idx
        rank = new_rank
        sa = order
        if r == n - 1:
            break
        k *= 2
    return sa.astype(np.int64)


def lcp_array(seq: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = longest common prefix of sa[i-1], sa[i]."""
    n = seq.size
    lcp = np.zeros(n, dtype=np.int64)
    rank = np.zeros(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and seq[i + h] == seq[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_run(tokens_a: list[str], tokens_b: list[str]) -> int:
    """Length (in tokens) of the longest contiguous token run shared by
    two token sequences, via a generalized suffix array with distinct
    sentinel separators."""
    if not tokens_a or not tokens_b:
        return 0
    vocab: dict[str, int] = {}
    def enc(toks: list[str]) -> list[int]:
        out = []
        for t in toks:
            v = vocab.get(t)
            if v is None:
                v = len(vocab) + 2  # reserve 0,1 for sentinels
                vocab[t] = v
            out.append(v)
        return out
    ea, eb = enc(tokens_a), enc(tokens_b)
    seq = np.array(ea + [0] + eb + [1], dtype=np.int64)
    sa = suffix_array(seq)
    lcp = lcp_array(seq, sa)
    na = len(ea)
    best = 0
    for i in range(1, seq.size):
        p, q = int(sa[i - 1]), int(sa[i])
        # adjacent suffixes from different documents
        if (p < na) != (q < na):
            run = int(lcp[i])
            # cap the run so it can't cross the sentinel boundary
            lim_p = (na - p) if p < na else (seq.size - 1 - p)
            lim_q = (na - q) if q < na else (seq.size - 1 - q)
            best = max(best, min(run, lim_p, lim_q))
    return best
