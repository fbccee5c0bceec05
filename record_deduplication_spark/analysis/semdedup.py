"""SemDeDup-style semantic deduplication over an embedding column.

Training-data-pipeline extra (no analog in the reference repo, whose
similarity stack is string-based: /root/reference/src/core/
similarity_engine.py): cluster embeddings into cells, then inside each
cell drop every row that is within cosine `tau` of an earlier-id row —
the "semantic duplicates" of Abbas et al. 2023 (SemDeDup), which
keeps one representative per tight semantic neighborhood without an
all-pairs corpus join.

Scale design (the 100 TB shape):
- The coarse quantizer is the IVF fit (analysis/ann.py): driver-side
  spherical k-means on a bounded sample, centroids BROADCAST; the
  corpus itself is assigned to cells in one Arrow-vectorized pass and
  stored/shuffled exactly once, keyed by cell.
- Pairwise cosine is confined to each cell (`applyInPandas`): one
  normalized matmul per cell, never a corpus self-join. Cell width is
  controlled by n_cells (size ∝ N / n_cells); a loud guard trips if a
  cell exceeds `max_cell_rows` instead of silently going quadratic —
  the fix at scale is more cells, not a bigger box.
- Keep rule: ascending-id greedy — row i is dropped iff ANY j < i in
  the same cell has round(cos, 4) >= tau. Deterministic, order-free
  across partitions (the kernel sorts by id), and exactly expressible
  in SQL, which is what the `semantic_dedup_cells` gate checks against
  DuckDB's list_cosine_similarity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .ann import _probe_cells_udf, fit_ivf_centroids


def _cell_dedup_kernel(id_col: str, vec_col: str, tau: float,
                       max_cell_rows: int):
    def dedup(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_cell_rows:
            raise ValueError(
                f"semantic_dedup: cell with {len(pdf)} rows exceeds "
                f"max_cell_rows={max_cell_rows}; pairwise cosine is "
                "quadratic per cell — raise n_cells instead")
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        lens = pdf[vec_col].map(len)
        modal = lens.mode().iloc[0] if len(pdf) else 0
        in_dim = (lens == modal).to_numpy()
        kept = np.ones(len(pdf), dtype=bool)  # off-dim rows: nothing comparable
        idx = np.flatnonzero(in_dim)
        if idx.size >= 2:
            x = np.array(pdf[vec_col].iloc[idx].tolist(), dtype=np.float64)
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            g = x @ x.T
            # half-away-from-zero, matching SQL round(): np.round is
            # half-to-even and flips the keep/drop verdict on an exact
            # 4-decimal tie at the tau boundary (e.g. cosine 1/32 with
            # tau=0.0313) — same fix as gate_queries._emb_near_dup_fn
            s = np.copysign(np.floor(np.abs(g) * 1e4 + 0.5) / 1e4, g)
            s[np.tril_indices(idx.size)] = -np.inf  # column i keeps only j < i
            kept[idx] = s.max(axis=0) < tau
        out = pdf[[id_col, "cell"]].copy()
        out["kept"] = kept
        return out
    return dedup


def semantic_dedup(corpus: DataFrame, *, id_col: str = "vec_id",
                   vec_col: str = "embedding", tau: float = 0.95,
                   n_cells: int = 64, cell_col: str | None = None,
                   sample_n: int = 50_000, seed: int = 42,
                   max_cell_rows: int = 100_000) -> DataFrame:
    """Per-row keep/drop verdicts: (id_col, cell, kept).

    `cell_col=None` (production) fits IVF centroids and assigns each
    row to its nearest cell; pass an existing column name to use
    precomputed / deterministic cells (the gate uses `label`).
    Downstream: `corpus.join(out.where("kept"), id_col, "left_semi")`.
    """
    has_vec = F.col(vec_col).isNotNull() & (F.size(vec_col) > 0)
    base = corpus.where(has_vec)
    if cell_col is not None:
        cells = base.withColumn("cell", F.col(cell_col).cast("bigint"))
    else:
        cents = fit_ivf_centroids(base, n_cells=n_cells, vec_col=vec_col,
                                  sample_n=sample_n, seed=seed)
        # only rows matching the quantizer's dimension can be probed: a
        # mixed-dimension corpus (partial re-embed, schema migration)
        # would make np.array ragged INSIDE the Arrow UDF and kill the
        # job; off-dimension rows have nothing comparable in any cell
        # and get explicit keep verdicts below, same as vectorless rows
        has_vec = has_vec & (F.size(vec_col) == int(cents.shape[1]))
        base = corpus.where(has_vec)
        probe = _probe_cells_udf(cents, n_probe=1)
        cells = base.withColumn("cell",
                                F.element_at(probe(F.col(vec_col)), 1)
                                .cast("bigint"))
    schema = StructType(
        [cells.schema[id_col], cells.schema["cell"]]).add("kept", "boolean")
    out = (cells.select(id_col, vec_col, "cell")
           .groupBy("cell")
           .applyInPandas(_cell_dedup_kernel(id_col, vec_col, tau,
                                             max_cell_rows), schema))
    # rows WITHOUT a usable embedding cannot be semantic duplicates —
    # emit them as explicit keep verdicts (cell -1) instead of silently
    # dropping them, so the documented `kept` left-semi never deletes
    # corpus rows that were merely missing a vector
    no_vec = (corpus.where(~F.coalesce(has_vec, F.lit(False)))
              .select(id_col, F.lit(-1).cast("bigint").alias("cell"),
                      F.lit(True).alias("kept")))
    return out.unionByName(no_vec)
