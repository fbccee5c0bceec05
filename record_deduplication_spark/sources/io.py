"""Format-dispatching input read (S2) and the Excel review report (S4).

Reference: ``FileHandler.load_data`` dispatches on extension
(/root/reference/src/io/file_handler.py:45-59: csv -> read_csv,
xlsx/xls -> read_excel, else ValueError) and
``ReportingEngine._generate_excel_report`` writes the banded review
workbook (/root/reference/src/core/reporting_engine.py:104-228:
bands at prob >= 0.9 / 0.6 and an FFF2CC fill on the ``prob`` column
of the manual_review sheet).

Spark-first split: bulk formats (parquet/csv/json) go straight to the
distributed reader; xlsx is a driver-side small-file format parsed by
:mod:`.xlsx` and parallelized with ``createDataFrame``. The report
path collects ONLY the already-banded (small) review frames.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .xlsx import read_xlsx, write_xlsx


def load_table(spark: SparkSession, path: str) -> DataFrame:
    """S2/S1: read an input table, dispatching on extension."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".parquet" or os.path.isdir(path):
        return spark.read.parquet(path)
    if ext == ".csv":
        return spark.read.option("header", True).option(
            "inferSchema", True).csv(path)
    if ext in (".json", ".jsonl", ".ndjson"):
        return spark.read.json(path)
    if ext in (".xlsx", ".xls"):
        if ext == ".xls":
            raise ValueError("legacy .xls (BIFF) is not supported; "
                             "save as .xlsx")
        pdf = read_xlsx(path)
        # an entirely-empty column has no inferable type — default it
        # to string rather than rejecting the workbook
        empty = {c: "string" for c in pdf.columns if pdf[c].isna().all()}
        return spark.createDataFrame(pdf.astype(empty) if empty else pdf)
    raise ValueError(f"Unsupported file format: {ext}")


def write_review_report(scored: DataFrame, path: str,
                        high: float = 0.9, low: float = 0.6,
                        prob_col: str = "prob",
                        max_rows_per_sheet: int = 100_000) -> dict:
    """S4: band scored pairs and write the multi-sheet review workbook.

    Banding happens in Spark (a filter, pushed to the scan); only the
    banded rows are collected, each sheet capped at
    ``max_rows_per_sheet`` ordered by descending probability so a cap
    keeps the most reviewable pairs. The ``manual_review`` sheet gets
    the reference's solid-fill highlight on ``prob_col``.

    Returns the reference's ``report_stats['probability_bands']``
    shape: {band: {count, mean_probability}} — counts are pre-cap.
    """
    p = F.col(prob_col)
    bands = {
        "high_confidence": scored.where(p >= high),
        "manual_review": scored.where((p >= low) & (p < high)),
        # NULL probs band as low-confidence, matching the stats agg's
        # .otherwise(...) routing
        "low_confidence": scored.where((p < low) | p.isNull()),
    }
    agg = (scored.select(
        F.when(p >= high, "high_confidence")
         .when(p >= low, "manual_review")
         .otherwise("low_confidence").alias("band"), p.alias("_p"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("count"),
             F.avg("_p").alias("mean_probability"))).collect()
    stats = {r["band"]: {"count": r["count"],
                         # avg over all-NULL probs is NULL, not a crash
                         "mean_probability": (float(r["mean_probability"])
                                              if r["mean_probability"]
                                              is not None else 0.0)}
             for r in agg}
    for b in bands:
        stats.setdefault(b, {"count": 0, "mean_probability": 0.0})
    sheets = {name: df.orderBy(F.col(prob_col).desc())
              .limit(max_rows_per_sheet).toPandas()
              for name, df in bands.items() if name != "low_confidence"}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_xlsx(path, sheets, highlight={"manual_review": prob_col})
    return stats
