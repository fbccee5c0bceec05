"""Deterministic testdata upscaler: sf0.1 -> sfN by replication.

The driver's correctness gate runs at sf0.01 (several gates return <100
rows there); VERDICT r4 #2 asks for the same 50-gate Spark-vs-DuckDB
sweep at sf1 scale so parity is demonstrated beyond fixture size. No
external data is allowed, so sf1 is synthesized from the driver's own
sf0.1 parquet: `replicas` FK-consistent copies of every fact table,
with per-replica key offsets and value perturbations that keep the
data *interesting* (joins fan out identically per replica; documents
of different replicas share no shingles; embeddings of different
replicas are not exact duplicates, so similarity top-k has no
cross-engine tie-break ambiguity).

Dimension tables (region, nation) are NOT replicated — their keys are
referenced by nationkey/regionkey columns that replicas keep verbatim,
exactly how a 10x fact load against fixed dimensions looks in
production.

Everything is seeded/derived from (replica, key): re-running the
script reproduces byte-identical tables.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pandas as pd

SRC_DEFAULT = "/root/testdata/sf0.1"

# key columns get offset r * STRIDE[family]; FK columns use the SAME
# stride as the table they reference, so each replica is a closed
# sub-universe and per-replica join cardinalities match the base
STRIDE = {
    "customer": 10_000_000,
    "supplier": 10_000_000,
    "part": 10_000_000,
    "orders": 100_000_000,
    "events": 100_000_000,
    "user": 10_000_000,
    "doc": 10_000_000,
    "vec": 10_000_000,
}

_TOKEN = re.compile(r"\S+")


def _tag_text(text: str, r: int) -> str:
    """Append `~r<replica>` to EVERY token: within-replica dup
    structure is preserved exactly (same pairs of docs still share the
    same shingles), while documents of different replicas share no
    k>=2 shingles — so pair-generating gates scale linearly in
    replicas instead of forming cross-replica cliques.

    The `~r` separator (never present in the source token alphabet —
    asserted in mut_documents) makes the no-cross-replica invariant
    hold for ANY replica count: a bare digit suffix collides once
    replicas exceed 10 ('abc1'+tag 1 == 'abc'+tag 11) or whenever a
    base token ends in a digit. With the separator, equal tagged
    tokens imply equal trailing digit runs after the final '~r'
    (=> same replica) and equal prefixes (=> same base token)."""
    if r == 0:
        return text
    suf = f"~r{r}"
    return _TOKEN.sub(lambda m: m.group(0) + suf, text)


def upscale(src: str, dst: str, replicas: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)

    def reps(df: pd.DataFrame, mutate) -> pd.DataFrame:
        out = []
        for r in range(replicas):
            c = df.copy()
            mutate(c, r)
            out.append(c)
        return pd.concat(out, ignore_index=True)

    rd = lambda t: pd.read_parquet(os.path.join(src, f"{t}.parquet"))
    wr = lambda t, df: df.to_parquet(os.path.join(dst, f"{t}.parquet"),
                                     index=False, row_group_size=250_000)

    # dimensions: verbatim
    for t in ("region", "nation"):
        wr(t, rd(t))

    def mut_customer(c, r):
        c["c_custkey"] += r * STRIDE["customer"]

    def mut_supplier(c, r):
        c["s_suppkey"] += r * STRIDE["supplier"]

    def mut_part(c, r):
        c["p_partkey"] += r * STRIDE["part"]

    def mut_orders(c, r):
        c["o_orderkey"] += r * STRIDE["orders"]
        c["o_custkey"] += r * STRIDE["customer"]

    def mut_lineitem(c, r):
        c["l_orderkey"] += r * STRIDE["orders"]
        c["l_partkey"] += r * STRIDE["part"]
        c["l_suppkey"] += r * STRIDE["supplier"]

    def mut_events(c, r):
        c["event_id"] += r * STRIDE["events"]
        c["user_id"] += r * STRIDE["user"]

    def mut_documents(c, r):
        c["doc_id"] += r * STRIDE["doc"]
        if r == 1:
            # replica 0 stays untagged, so the separator must be absent
            # from the source alphabet or a base token like 'x~r1'
            # would alias replica 1's tag of 'x'
            assert not c["text"].str.contains("~", regex=False).any(), \
                "source documents contain '~': pick another tag separator"
        if r:
            c["text"] = [_tag_text(t, r) for t in c["text"]]
            c["n_chars"] = c["text"].str.len().astype("int64")

    def mut_embeddings(c, r):
        c["vec_id"] += r * STRIDE["vec"]
        if r:
            # deterministic per-replica jitter (~1% of component scale)
            # so no two replicas are exact vector duplicates: exact
            # duplicates make cosine top-k a cross-engine tie-break
            # lottery; jittered replicas keep the gate's ordering total
            rng = np.random.default_rng(10_000 + r)
            c["embedding"] = [
                (np.asarray(v, dtype=np.float32)
                 + rng.normal(0.0, 0.01, len(v)).astype(np.float32))
                for v in c["embedding"]]

    for t, m in (("customer", mut_customer), ("supplier", mut_supplier),
                 ("part", mut_part), ("orders", mut_orders),
                 ("lineitem", mut_lineitem), ("events", mut_events),
                 ("documents", mut_documents), ("embeddings", mut_embeddings)):
        wr(t, reps(rd(t), m))
        print(f"wrote {t}", flush=True)


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1"
    src = sys.argv[2] if len(sys.argv) > 2 else SRC_DEFAULT
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    upscale(src, dst, n)
