"""spark-submit entry point for the dedup pipeline.

The north rule requires the pipeline to be "launched via spark-submit
--py-files on multi-executor clusters" (BASELINE.json:14). This module
is that launcher:

    python -m record_deduplication_spark.cli --make-pyfiles dist/rds.zip
    spark-submit --master <cluster> --py-files dist/rds.zip \
        jobs/run_dedup.py --input s3://.../clips --workdir iceberg.dedup

The input may be any Spark-readable path; the WORKDIR must be either a
LOCAL path (parquet checkpoint mode — single-node/test runs) or an
Iceberg catalog namespace like `iceberg.dedup` (cluster runs; remote
object storage goes through the catalog). A remote URI workdir without
Iceberg fails fast in CheckpointStore with this exact remedy.

Inside spark-submit there is already a SparkSession (or one is created
honoring the submit-provided master/conf); locally (tests/bench) the
tuned `build_session` defaults apply. The reference analog is the
per-stage CLI surface (/root/reference/src/cli/main.py:172-349) — here
it is one job because stages checkpoint+resume instead of re-reading
CSVs (SURVEY.md §3.4-3.5).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import zipfile


def parse_config_overrides(pairs: list[str]):
    """`--set key=value` overrides onto DedupConfig (typed by field)."""
    from .config import DEFAULT_CONFIG, DedupConfig

    fields = {f.name: f.type for f in dataclasses.fields(DedupConfig)}
    out = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"--set expects key=value, got {p!r}")
        k, v = p.split("=", 1)
        if k not in fields:
            raise SystemExit(f"unknown config key {k!r}; valid: {sorted(fields)}")
        cur = getattr(DEFAULT_CONFIG, k)
        # coerce per-type: int(v) rejects non-integers loudly (no
        # silent truncation of --set num_perm=63.7), bools get an
        # explicit parser (bool is an int subclass — bool(float(v))
        # would accept anything truthy)
        if isinstance(cur, bool):
            if v.lower() not in ("true", "false", "1", "0"):
                raise SystemExit(f"--set {k} expects true/false, got {v!r}")
            out[k] = v.lower() in ("true", "1")
        elif isinstance(cur, int):
            try:
                out[k] = int(v)
            except ValueError:
                raise SystemExit(f"--set {k} expects an integer, got {v!r}")
        elif isinstance(cur, float):
            try:
                out[k] = float(v)
            except ValueError:
                raise SystemExit(f"--set {k} expects a number, got {v!r}")
        else:
            out[k] = v
    cfg = dataclasses.replace(DEFAULT_CONFIG, **out)
    # cross-field constraints validated HERE, at the CLI boundary: the
    # lsh_rows property's assert would otherwise fire mid-pipeline (or
    # vanish under python -O and silently change the band geometry)
    if cfg.num_perm % cfg.lsh_bands != 0:
        raise SystemExit(
            f"--set: num_perm={cfg.num_perm} must be divisible by "
            f"lsh_bands={cfg.lsh_bands} (rows per band must be integral)")
    return cfg


def make_pyfiles_zip(dest: str) -> str:
    """Package the engine into a --py-files zip (no tests, no caches)."""
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    base = os.path.dirname(pkg_root)
    os.makedirs(os.path.dirname(os.path.abspath(dest)) or ".", exist_ok=True)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg_root):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, base))
    return dest


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="record_deduplication_spark",
        description="PySpark near-duplicate detection + clustering pipeline")
    ap.add_argument("--input", help="clips parquet path or Iceberg table name")
    ap.add_argument("--workdir", help="checkpoint/metrics location (path or catalog ns)")
    ap.add_argument("--resume", action=argparse.BooleanOptionalAction, default=True,
                    help="reuse completed stage checkpoints (default: on)")
    ap.add_argument("--set", dest="overrides", action="append", default=[],
                    metavar="KEY=VALUE", help="DedupConfig override, repeatable")
    ap.add_argument("--max-cluster-size", type=int, default=None,
                    help="run the C6 adaptive subdivision post-stage and "
                         "commit a size-bounded clusters_sub table")
    ap.add_argument("--incremental-input", default=None, metavar="PATH",
                    help="daily-ingest mode: fold ONLY this new batch into "
                         "the completed run under --workdir (O(|new|) stage "
                         "appends, no old x old re-pairing); --input must "
                         "then be the FULL corpus including the batch — the "
                         "payload source for old x new audio verification")
    ap.add_argument("--incremental-strict", action="store_true",
                    help="with --incremental-input: re-pair every block the "
                         "batch touches over its COMBINED members so the "
                         "folded candidates/edges are pair-for-pair equal to "
                         "a from-scratch run (audit mode; costs "
                         "O(touched-block^2) extra verification for no "
                         "recall gain — cluster assignments already match "
                         "without it)")
    ap.add_argument("--master", default=None,
                    help="only for local runs; under spark-submit leave unset")
    ap.add_argument("--json-out", default=None,
                    help="write run stats JSON to this file (also printed)")
    ap.add_argument("--report", default=None, metavar="PATH.xlsx",
                    help="write the S4 review workbook (banded edge "
                         "probabilities, highlighted manual_review sheet)")
    ap.add_argument("--make-pyfiles", metavar="DEST.zip",
                    help="just build the --py-files zip and exit")
    ap.add_argument("--decontaminate-eval", default=None, metavar="PATH",
                    help="decontamination-only mode: report/remove eval rows "
                         "sharing any word n-gram with the --input corpus "
                         "(transcript/text column auto-detected); no "
                         "--workdir needed")
    ap.add_argument("--decontaminate-out", default=None, metavar="PATH",
                    help="with --decontaminate-eval: also write the cleaned "
                         "eval table (rows under --decontaminate-max-ratio) "
                         "as parquet here")
    ap.add_argument("--decontaminate-ngram", type=int, default=8,
                    help="n-gram width for the overlap scan (default 8)")
    ap.add_argument("--decontaminate-max-ratio", type=float, default=0.0,
                    help="contaminated-gram fraction above which an eval row "
                         "is dropped (default 0.0 = any shared n-gram)")
    return ap


def _text_cols(df) -> tuple[str, str]:
    """(id_col, text_col) for decontamination: the clips schema uses
    (clip_id, transcript), the documents shape (doc_id, text)."""
    cols = set(df.columns)
    for idc, txt in (("clip_id", "transcript"), ("doc_id", "text"),
                     ("id", "text")):
        if {idc, txt} <= cols:
            return idc, txt
    raise SystemExit(
        f"--decontaminate-eval: no (id, text) column pair found in "
        f"{sorted(cols)}; expected clip_id/transcript or doc_id/text")


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.make_pyfiles:
        print(make_pyfiles_zip(args.make_pyfiles))
        return 0
    if args.decontaminate_eval:
        if not args.input:
            raise SystemExit("--decontaminate-eval needs --input (the train corpus)")
    elif not args.input or not args.workdir:
        raise SystemExit("--input and --workdir are required (or --make-pyfiles)")

    from pyspark.sql import SparkSession

    from .plans.pipeline import DedupPipeline
    from .session import build_session

    cfg = parse_config_overrides(args.overrides)
    # under spark-submit an active/configured session context exists;
    # getOrCreate inherits its master + conf, so build_session's local
    # defaults only kick in when launched bare (tests, bench).
    active = SparkSession.getActiveSession()
    spark = active or build_session(app="dedup_submit", master=args.master)

    def _load(name: str):
        if "/" not in name and not name.endswith(
                (".parquet", ".orc", ".csv", ".json", ".jsonl", ".ndjson",
                 ".xlsx", ".xls")):
            return spark.read.table(name)
        from .sources.io import load_table
        return load_table(spark, name)

    clips = _load(args.input)
    if args.decontaminate_eval:
        from pyspark.sql import functions as F

        from .analysis.decontaminate import contamination_report

        ev = _load(args.decontaminate_eval)
        # columns resolve PER TABLE: a clips train corpus
        # (clip_id/transcript) against a documents-shaped eval
        # (doc_id/text) is the normal mixed case — align the train
        # side to the eval names (the train id is never emitted)
        idc, txt = _text_cols(ev)
        idc_t, txt_t = _text_cols(clips)
        train = clips.select(F.col(idc_t).alias(idc),
                             F.col(txt_t).alias(txt))
        n = args.decontaminate_ngram
        mr = args.decontaminate_max_ratio
        # one row per eval doc — pin it so the stats agg and the
        # cleaned-output anti-join don't each recompute the train
        # n-gram profile (the heavy side)
        rep = contamination_report(train, ev, id_col=idc, text_col=txt,
                                   n=n).localCheckpoint(eager=True)
        flagged_cond = F.col("n_contaminated") > mr * F.col("n_grams")
        agg = rep.agg(
            F.count("*").alias("n_eval_with_grams"),
            F.coalesce(F.sum(flagged_cond.cast("int")), F.lit(0))
            .alias("n_flagged"),
            F.coalesce(F.round(F.avg("contamination_ratio"), 6), F.lit(0.0))
            .alias("mean_ratio")
        ).collect()[0]
        stats = {"mode": "decontaminate", "ngram": n, "max_ratio": mr,
                 "n_eval_rows": ev.count(), **agg.asDict()}
        if args.decontaminate_out:
            bad = F.broadcast(rep.where(flagged_cond).select(idc))
            clean = ev.join(bad, idc, "left_anti")
            clean.write.mode("overwrite").parquet(args.decontaminate_out)
            stats["n_kept"] = spark.read.parquet(args.decontaminate_out).count()
            stats["out"] = args.decontaminate_out
        line = json.dumps(stats)
        print(line)
        if args.json_out:
            with open(args.json_out, "w") as f:
                f.write(line + "\n")
        if active is None:
            spark.stop()
        return 0
    pipe = DedupPipeline(spark, args.workdir, cfg)
    if args.incremental_input:
        res = pipe.run_incremental(_load(args.incremental_input),
                                   all_clips=clips,
                                   strict=args.incremental_strict,
                                   max_cluster_size=args.max_cluster_size)
    else:
        res = pipe.run(clips, resume=args.resume,
                       max_cluster_size=args.max_cluster_size)
    stats = {"config": cfg.to_dict(), **res.stats}
    if args.report:
        from .operators.verify import edge_prob01
        from .sources.io import write_review_report
        stats["report"] = write_review_report(
            res.edges.select("id_1", "id_2", "verdict",
                             edge_prob01().alias("prob")), args.report)
    line = json.dumps(stats)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")
    if active is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
