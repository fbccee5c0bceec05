"""Single-process reference-semantics oracle.

Mirrors the reference pipeline's shape — blocking union (B1-B5,
/root/reference/src/core/blocking_engine.py:51-128), pairwise
verification (F1-F4, /root/reference/src/core/similarity_engine.py),
union-find merge (G1, /root/reference/src/core/openai_deduplicator.py:126-172)
— but with the north rule's dup mechanisms (MinHash-LSH over transcript
shingles, SimHash over decoded-PCM fingerprints, exact-substring runs)
at the SAME DedupConfig as the Spark pipeline. The Spark pipeline's
dup-pair recall (>=0.99) is scored against this oracle's cluster
assignments.

Pure pandas/numpy; quadratic-safe only at test scale (the point — it
is the semantics pin, not the engine).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np
import pandas as pd

from .config import DedupConfig, DEFAULT_CONFIG
from .functions import audio as A
from .functions import hashing as H
from .functions import text as X


class _UnionFind:
    """Path-compressed union-find (reference G1 analog)."""

    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = self.find(p)
        return self.parent[x]

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes root
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def oracle_dedup(clips: pd.DataFrame, cfg: DedupConfig = DEFAULT_CONFIG) -> dict:
    """Run the full oracle; returns dict with 'pairs' (DataFrame
    id_1,id_2,source), 'clusters' (DataFrame clip_id,cluster_id with
    -1 noise), and per-stage stats."""
    ids = clips["clip_id"].tolist()
    norm = {r.clip_id: X.normalize_text(r.transcript) for r in clips.itertuples()}
    toks = {i: X.tokenize(norm[i]) for i in ids}
    shing = {i: X.shingles(toks[i], cfg.shingle_k) for i in ids}
    shing_sets = {i: set(s) for i, s in shing.items()}
    sha = {r.clip_id: hashlib.sha256(r.bytes).hexdigest() for r in clips.itertuples()}
    pcm = {}
    sr = {}
    for r in clips.itertuples():
        p, s = A.decode_wav(r.bytes)
        pcm[r.clip_id] = p
        sr[r.clip_id] = s
    fp = {i: A.pcm_fingerprint_spectral(pcm[i], sr[i], cfg.fp_time_frames,
                                        cfg.fp_freq_bands, cfg.fp_fmin_hz,
                                        cfg.fp_fmax_hz)
          for i in ids}

    a_coef, b_coef = H.minhash_params(cfg.num_perm, cfg.minhash_seed)
    sig = {}
    for i in ids:
        hh = H.hash_strs_u64(shing[i])
        sig[i] = H.minhash_signature(hh, a_coef, b_coef)

    pairs: dict[tuple[str, str], set[str]] = defaultdict(set)

    def add_pair(x: str, y: str, src: str) -> None:
        if x == y:
            return
        key = (x, y) if x < y else (y, x)
        pairs[key].add(src)

    # --- B1-analog: exact block on (sha256(bytes), transcript) ---
    exact_groups: dict[tuple[str, str], list[str]] = defaultdict(list)
    for i in ids:
        exact_groups[(sha[i], norm[i])].append(i)
    for members in exact_groups.values():
        # full pairing (clique semantics); k=0 covers the hub pair
        for j in range(1, len(members)):
            for k in range(j):
                add_pair(members[k], members[j], "exact")

    # --- B4-analog: MinHash-LSH banded blocking over transcript shingles ---
    buckets: dict[tuple[int, int], list[str]] = defaultdict(list)
    for i in ids:
        if not shing[i]:
            continue
        bh = H.band_hashes(sig[i], cfg.lsh_bands)
        for b in range(cfg.lsh_bands):
            buckets[(b, int(bh[b]))].append(i)
    for members in buckets.values():
        for j in range(1, len(members)):
            for k in range(j):
                add_pair(members[k], members[j], "lsh")

    # --- SimHash Hamming blocking over PCM fingerprints ---
    fpb: dict[tuple[int, int], list[str]] = defaultdict(list)
    n_bands = cfg.simhash_hamming_k + 1
    for i in ids:
        for b_idx, b_val in enumerate(H.simhash_bands(fp[i], n_bands)):
            fpb[(b_idx, b_val)].append(i)
    for members in fpb.values():
        for j in range(1, len(members)):
            for k in range(j):
                add_pair(members[k], members[j], "simhash")

    # --- exact-substring blocking: shared L-token gram ---
    gb: dict[int, list[str]] = defaultdict(list)
    for i in ids:
        seen = set()
        for g in X.grams(toks[i], cfg.substring_min_tokens):
            hg = H.hash_str_u64(g)
            if hg not in seen:
                seen.add(hg)
                gb[hg].append(i)
    for members in gb.values():
        for j in range(1, len(members)):
            for k in range(j):
                add_pair(members[k], members[j], "substring")

    # --- pairwise verification (F-stage analog) ---
    edges: list[tuple[str, str, str, float]] = []
    for (x, y), srcs in pairs.items():
        if sha[x] == sha[y] and norm[x] == norm[y]:
            edges.append((x, y, "exact", 1.0))
            continue
        ok = False
        if ("lsh" in srcs or "substring" in srcs) and shing_sets[x] and shing_sets[y]:
            j = X.jaccard(shing_sets[x], shing_sets[y])
            if j >= cfg.jaccard_threshold:
                edges.append((x, y, "text", j))
                ok = True
            elif "substring" in srcs:
                # sharing an L-token gram IS the substring-dup criterion
                if (set(X.grams(toks[x], cfg.substring_min_tokens))
                        & set(X.grams(toks[y], cfg.substring_min_tokens))):
                    edges.append((x, y, "substring", j))
                    ok = True
        if not ok and "simhash" in srcs:
            if H.hamming64(fp[x], fp[y]) <= cfg.simhash_hamming_verify and norm[x] == norm[y]:
                passed, s = A.pcm_allclose_snr(pcm[x], sr[x], pcm[y], sr[y], cfg.snr_db_min)
                if passed:
                    edges.append((x, y, "audio", s))

    # --- union-find -> clusters; singletons get noise label -1 ---
    uf = _UnionFind()
    for x, y, _, _ in edges:
        uf.union(x, y)
    root_of = {i: uf.find(i) for i in ids if i in uf.parent}
    members_of: dict[str, list[str]] = defaultdict(list)
    for i, r in root_of.items():
        members_of[r].append(i)
    label = {}
    next_label = 0
    for r in sorted(members_of):
        if len(members_of[r]) > 1:
            for m in members_of[r]:
                label[m] = next_label
            next_label += 1
    clusters = pd.DataFrame(
        {"clip_id": ids,
         "cluster_id": [label.get(i, -1) for i in ids]}
    )
    pairs_df = pd.DataFrame(edges, columns=["id_1", "id_2", "source", "score"])
    return {
        "pairs": pairs_df,
        "clusters": clusters,
        "stats": {
            "n_clips": len(ids),
            "n_candidates": len(pairs),
            "n_edges": len(edges),
            "n_clusters": next_label,
        },
    }


def cluster_pairs(clusters: pd.DataFrame) -> set[tuple[str, str]]:
    """Co-membership pairs implied by cluster assignments (noise
    excluded). Noise is -1 in the densified integer convention and
    NULL in the engine's default string-representative convention —
    accept either. This is the pair set dup-pair recall is measured
    on."""
    cid = clusters["cluster_id"]
    # strip a float-typed '.0' before the noise compare: a pandas/
    # parquet round-trip can promote densified long ids to float64, and
    # '-1.0' != '-1' would pass every noise row into one giant pseudo-
    # cluster, silently inflating recall
    labels = cid.astype("string").str.replace(r"\.0$", "", regex=True)
    clustered = cid.notna() & (labels != "-1")
    out: set[tuple[str, str]] = set()
    for _, grp in clusters[clustered].groupby("cluster_id"):
        m = sorted(grp["clip_id"])
        for j in range(1, len(m)):
            for k in range(j):
                out.add((m[k], m[j]))
    return out


def pair_recall(ours: pd.DataFrame, oracle: pd.DataFrame) -> float:
    """|co-clustered in both| / |oracle co-clustered|."""
    po, pr = cluster_pairs(ours), cluster_pairs(oracle)
    if not pr:
        return 1.0
    return len(po & pr) / len(pr)
