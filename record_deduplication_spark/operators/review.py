"""G5: batch + parallel review fan-out over candidate pairs.

Reference: ``OpenAIDeduplicator.deduplicate_with_ai`` chunks the
high-similarity pairs into batches of ``config.batch_size`` and fans
them out to an external reviewer on a
``ThreadPoolExecutor(max_workers=config.max_workers)``, collecting one
verdict dict per pair; a failed batch degrades to per-pair error rows
(``same_organization=False, confidence=0.0, error=True``) rather than
aborting the run (/root/reference/src/core/openai_deduplicator.py:316-364).
The verdict/summary shapes come from
/root/reference/src/core/openai_types.py and the summary block at
``:368-375`` (total_pairs_analyzed / pairs_merged / merge_rate).

Spark-first mapping (SURVEY §2 G5: "partition → batch → parallel map
= mapInPandas"): Spark tasks replace the driver-side executor as the
OUTER level of parallelism — each partition independently chunks its
pairs and calls the reviewer, so fan-out scales with the cluster, not
with one driver's thread pool. Because a real reviewer is an I/O-bound
network client (a task slot would idle on every request), an INNER
per-partition ``ThreadPoolExecutor`` multiplies in-flight requests per
task, recovering the reference's ``max_workers`` semantics without a
collect. Nothing touches the driver: verdicts come back as an ordinary
DataFrame.

The external API itself is out of engine scope; ``reviewer`` is a
plain picklable callable (batch of pair dicts -> list of verdict
dicts), and :func:`threshold_reviewer` provides the deterministic
local stand-in used by tests and the ``batch_review_fanout`` gate.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VERDICT_SCHEMA = ("pair_id string, same_organization boolean, "
                  "confidence double, primary_record_id string, "
                  "canonical_name string, error boolean")

#: reference pair_info shape (openai_deduplicator.py:292-310)
_RECORD_FIELDS = ("company", "domain", "phone")


def _pair_info(row: dict, id1_col: str, id2_col: str, score_col: str,
               attr_cols: tuple[str, ...]) -> dict:
    def rec(suffix: str, rid) -> dict:
        out = {"id": rid}
        for a in attr_cols:
            out[a] = row.get(f"{a}_{suffix}", "") or ""
        return out

    id1, id2 = row[id1_col], row[id2_col]
    s = row.get(score_col)
    return {
        "pair_id": f"{id1}-{id2}",
        "similarity_score": float(s) if s is not None and not (
            isinstance(s, float) and math.isnan(s)) else 0.0,
        "record_1": rec("1", id1),
        "record_2": rec("2", id2),
    }


def _error_rows(batch: list[dict]) -> list[dict]:
    """Reference's failed-batch degradation (:349-360), verbatim shape."""
    return [{
        "pair_id": p["pair_id"],
        "same_organization": False,
        "confidence": 0.0,
        "primary_record_id": str(p["record_1"]["id"]),
        "canonical_name": p["record_1"].get("company", ""),
        "error": True,
    } for p in batch]


def batch_review_fanout(pairs: DataFrame,
                        reviewer: Callable[[list[dict]], list[dict]],
                        *, batch_size: int = 10,
                        max_workers_per_partition: int = 10,
                        max_retries: int = 1,
                        id1_col: str = "id_1", id2_col: str = "id_2",
                        score_col: str = "score",
                        attr_cols: tuple[str, ...] = _RECORD_FIELDS
                        ) -> DataFrame:
    """Fan candidate pairs out to ``reviewer`` in parallel batches.

    ``reviewer`` receives a batch (list of the reference's pair_info
    dicts) and returns one verdict dict per pair; it is retried
    ``max_retries`` times on exception, then the batch degrades to
    per-pair error rows. Attribute columns ``{attr}_1`` / ``{attr}_2``
    are optional — absent ones become ``""`` exactly like the
    reference's ``row.get(..., '')``.
    """
    cols = [id1_col, id2_col]
    if score_col in pairs.columns:
        cols.append(score_col)
    for a in attr_cols:
        for sfx in ("1", "2"):
            c = f"{a}_{sfx}"
            if c in pairs.columns:
                cols.append(c)
    slim = pairs.select(*cols)

    def run_partition(pdf_iter: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def review_batch(batch: list[dict]) -> list[dict]:
            for attempt in range(max_retries + 1):
                try:
                    out = reviewer(batch)
                    if len(out) != len(batch):
                        raise ValueError(
                            f"reviewer returned {len(out)} verdicts "
                            f"for {len(batch)} pairs")
                    return [{**v, "error": bool(v.get("error", False))}
                            for v in out]
                except Exception:
                    if attempt == max_retries:
                        return _error_rows(batch)
            return _error_rows(batch)  # unreachable

        for pdf in pdf_iter:
            infos = [_pair_info(r, id1_col, id2_col, score_col, attr_cols)
                     for r in pdf.to_dict("records")]
            batches = [infos[i:i + batch_size]
                       for i in range(0, len(infos), batch_size)]
            if not batches:
                continue
            if max_workers_per_partition > 1 and len(batches) > 1:
                with ThreadPoolExecutor(max_workers_per_partition) as ex:
                    results = list(ex.map(review_batch, batches))
            else:
                results = [review_batch(b) for b in batches]
            flat = [v for rs in results for v in rs]
            yield pd.DataFrame(flat, columns=[
                "pair_id", "same_organization", "confidence",
                "primary_record_id", "canonical_name", "error"])

    return slim.mapInPandas(run_partition, schema=VERDICT_SCHEMA)


def threshold_reviewer(threshold: float = 0.9
                       ) -> Callable[[list[dict]], list[dict]]:
    """Deterministic local reviewer: merge iff similarity >= threshold;
    canonical name = the longer company (ties -> lexicographically
    smaller); primary record = smaller id. Pure function of the batch,
    so the fan-out is oracle-checkable."""
    def review(batch: list[dict]) -> list[dict]:
        out = []
        for p in batch:
            c1 = p["record_1"].get("company", "")
            c2 = p["record_2"].get("company", "")
            canonical = (c1 if (len(c1), c2) > (len(c2), c1) else c2) \
                if (c1 or c2) else ""
            out.append({
                "pair_id": p["pair_id"],
                "same_organization": p["similarity_score"] >= threshold,
                "confidence": p["similarity_score"],
                "primary_record_id": str(min(p["record_1"]["id"],
                                             p["record_2"]["id"],
                                             key=str)),
                "canonical_name": canonical,
            })
        return out
    return review


def review_summary(verdicts: DataFrame) -> dict:
    """Reference's summary_stats block (:368-375): one distributed agg."""
    r = verdicts.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("same_organization").cast("long")).alias("merged"),
        F.sum(F.col("error").cast("long")).alias("errors")).collect()[0]
    total = r["total"] or 0
    merged = int(r["merged"] or 0)
    return {"total_pairs_analyzed": total,
            "pairs_merged": merged,
            "merge_rate": merged / total if total else 0.0,
            "error_pairs": int(r["errors"] or 0)}
