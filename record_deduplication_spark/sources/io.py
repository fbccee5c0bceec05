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
    """S2/S1: read an input table, dispatching on extension. Extension
    wins over is-a-directory: Spark writers produce DIRECTORIES named
    `out.csv`/`out.json`, which must dispatch to their format's reader
    (both readers accept part-file directories), not to parquet."""
    ext = os.path.splitext(path)[1].lower()
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
        if len(pdf.columns) == 0:
            raise ValueError(f"{path}: workbook sheet has no header row")
        # header-only sheet / entirely-empty columns have no inferable
        # type — default to string rather than rejecting the workbook
        empty = {c: "string" for c in pdf.columns
                 if pdf[c].isna().all()} if len(pdf) else \
                {c: "string" for c in pdf.columns}
        return spark.createDataFrame(pdf.astype(empty) if empty else pdf,
                                     schema=None if len(pdf) else
                                     ", ".join(f"`{c}` string"
                                               for c in pdf.columns))
    if ext == ".orc":
        # built into Spark (no external package) — common lakehouse
        # interchange format alongside parquet
        return spark.read.orc(path)
    if ext == ".parquet" or os.path.isdir(path):
        return spark.read.parquet(path)
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
    # NaN compares GREATER than any number in Spark ordering — without
    # the isnan guard a NaN prob lands in high_confidence (and leaks
    # non-RFC `NaN` tokens into the JSON stats); route NaN with NULL
    # into low_confidence, where unscorable pairs belong
    p = F.when(F.isnan(F.col(prob_col)), F.lit(None)) \
         .otherwise(F.col(prob_col))
    # one materialization serves the stats agg + both sheet collects
    # (scored is usually a computed plan — cli passes a projection of
    # the verified edge set; three uncached passes = three full jobs)
    banded = scored.withColumn("_p", p).localCheckpoint(eager=True)
    pb = F.col("_p")
    agg = (banded.select(
        F.when(pb >= high, "high_confidence")
         .when(pb >= low, "manual_review")
         .otherwise("low_confidence").alias("band"), pb)
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("count"),
             F.avg("_p").alias("mean_probability"))).collect()
    stats = {r["band"]: {"count": r["count"],
                         # avg over all-NULL probs is NULL, not a crash
                         "mean_probability": (float(r["mean_probability"])
                                              if r["mean_probability"]
                                              is not None else 0.0)}
             for r in agg}
    for b in ("high_confidence", "manual_review", "low_confidence"):
        stats.setdefault(b, {"count": 0, "mean_probability": 0.0})
    sheet_bands = {"high_confidence": banded.where(pb >= high),
                   "manual_review": banded.where((pb >= low) & (pb < high))}
    sheets = {name: df.orderBy(pb.desc())
              .limit(max_rows_per_sheet).drop("_p").toPandas()
              for name, df in sheet_bands.items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_xlsx(path, sheets, highlight={"manual_review": prob_col})
    return stats
