"""Launch-contract test: the pipeline runs under real `spark-submit
--py-files <zip>` (north rule, BASELINE.json:14), with the engine
delivered ONLY via the zip (cwd stripped from the child's import path).
"""

import json
import os
import subprocess
import sys

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_pyfiles_e2e(tmp_path):
    from record_deduplication_spark.cli import make_pyfiles_zip
    from record_deduplication_spark.datagen import write_clips_parquet

    corpus = tmp_path / "corpus"
    write_clips_parquet(str(corpus), n_clips=120, seed=7,
                        dur_min_ms=200, dur_max_ms=600)
    zip_path = make_pyfiles_zip(str(tmp_path / "rds.zip"))
    with __import__("zipfile").ZipFile(zip_path) as z:
        names = z.namelist()
    assert "record_deduplication_spark/plans/pipeline.py" in names
    assert not any(n.startswith("tests/") for n in names)

    out_json = tmp_path / "stats.json"
    env = {**os.environ,
           "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    # run from tmp_path so the repo checkout is NOT importable: the
    # driver and executors must get the package from --py-files alone
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "jobs", "run_dedup.py"),
         "--input", str(corpus / "clips.parquet"),
         "--workdir", str(tmp_path / "work"),
         "--set", "num_perm=64",
         "--json-out", str(out_json),
         "--report", str(tmp_path / "review.xlsx")],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]
    stats = json.loads(out_json.read_text())
    assert stats["n_clips"] == 120
    assert stats["n_edges"] > 0 and stats["n_clusters"] > 0
    assert stats["config"]["num_perm"] == 64
    # stage checkpoints + metrics landed in the workdir
    work = tmp_path / "work"
    for stage in ("signed", "candidates", "edges", "clusters"):
        assert (work / stage).exists()
    # S4 review workbook written and readable with our own codec
    from record_deduplication_spark.sources.xlsx import read_xlsx
    hi = read_xlsx(str(tmp_path / "review.xlsx"), "high_confidence")
    assert stats["report"]["high_confidence"]["count"] >= len(hi) >= 0
    assert sum(b["count"] for b in stats["report"].values()) == stats["n_edges"]


def test_config_overrides_typed():
    from record_deduplication_spark.cli import parse_config_overrides

    cfg = parse_config_overrides(["jaccard_threshold=0.7", "num_perm=128"])
    assert cfg.jaccard_threshold == 0.7 and cfg.num_perm == 128
    with pytest.raises(SystemExit):
        parse_config_overrides(["not_a_key=1"])
    with pytest.raises(SystemExit):
        parse_config_overrides(["malformed"])


def test_cli_incremental_mode(tmp_path, spark):
    """--incremental-input folds a new batch into a completed run via
    cli.main, producing the same clusters a full-run CLI invocation
    over the combined corpus produces."""
    import json

    import pandas as pd
    import pyspark.sql.functions as F

    from record_deduplication_spark.cli import main
    from record_deduplication_spark.datagen import generate_clips

    clips_pdf, _ = generate_clips(n_clips=300, seed=44)
    clips = spark.createDataFrame(clips_pdf)
    is_new = F.pmod(F.xxhash64("clip_id"), F.lit(5)) == 0
    allp = str(tmp_path / "all.parquet")
    oldp = str(tmp_path / "old.parquet")
    newp = str(tmp_path / "new.parquet")
    clips.write.parquet(allp)
    clips.where(~is_new).write.parquet(oldp)
    clips.where(is_new).write.parquet(newp)

    wd_full = str(tmp_path / "wd_full")
    wd_inc = str(tmp_path / "wd_inc")
    out_full = str(tmp_path / "full.json")
    out_inc = str(tmp_path / "inc.json")
    assert main(["--input", allp, "--workdir", wd_full,
                 "--json-out", out_full]) == 0
    assert main(["--input", oldp, "--workdir", wd_inc]) == 0
    assert main(["--input", allp, "--workdir", wd_inc,
                 "--incremental-input", newp,
                 "--json-out", out_inc]) == 0

    stats = json.load(open(out_inc))
    assert stats["n_new_clips"] > 0
    assert stats["n_clips"] == 300
    a = pd.read_parquet(f"{wd_full}/clusters").sort_values("clip_id") \
          .reset_index(drop=True)
    b = pd.read_parquet(f"{wd_inc}/clusters").sort_values("clip_id") \
          .reset_index(drop=True)
    assert a.equals(b)

    # --incremental-strict reaches the strict fold (audit mode): the
    # same batch folded strictly into a fresh copy of the base run
    # reports a reverified-pair count and identical clusters
    wd_strict = str(tmp_path / "wd_strict")
    out_strict = str(tmp_path / "strict.json")
    assert main(["--input", oldp, "--workdir", wd_strict]) == 0
    assert main(["--input", allp, "--workdir", wd_strict,
                 "--incremental-input", newp, "--incremental-strict",
                 "--json-out", out_strict]) == 0
    st = json.load(open(out_strict))
    assert "n_reverified_pairs" in st  # strict path ran
    c = pd.read_parquet(f"{wd_strict}/clusters").sort_values("clip_id") \
          .reset_index(drop=True)
    assert a.equals(c)


def test_cli_decontaminate_mode(tmp_path, spark):
    """--decontaminate-eval: reports overlap of an eval set's
    transcripts against the corpus and writes the cleaned table."""
    import json

    from record_deduplication_spark.cli import main
    from record_deduplication_spark.datagen import generate_clips

    clips_pdf, _ = generate_clips(n_clips=120, seed=9)
    corpus = spark.createDataFrame(clips_pdf)
    trainp = str(tmp_path / "train.parquet")
    corpus.write.parquet(trainp)
    # eval: 3 rows copied verbatim from the corpus (leaked) + 2 novel
    leaked = clips_pdf.head(3)[["clip_id", "transcript"]].copy()
    leaked["clip_id"] = ["ev0", "ev1", "ev2"]
    novel = [("ev3", "zq wv xk pj unique eval only words here truly novel"),
             ("ev4", "another fully novel eval row with no corpus overlap")]
    ev = spark.createDataFrame(
        list(leaked.itertuples(index=False, name=None)) + novel,
        ["clip_id", "transcript"])
    evalp = str(tmp_path / "eval.parquet")
    ev.write.parquet(evalp)

    outp = str(tmp_path / "clean.parquet")
    jsonp = str(tmp_path / "decon.json")
    assert main(["--input", trainp, "--decontaminate-eval", evalp,
                 "--decontaminate-ngram", "4",
                 "--decontaminate-out", outp, "--json-out", jsonp]) == 0
    stats = json.loads(open(jsonp).read())
    assert stats["mode"] == "decontaminate"
    assert stats["n_eval_rows"] == 5 and stats["n_flagged"] == 3
    kept = spark.read.parquet(outp)
    assert sorted(r.clip_id for r in kept.collect()) == ["ev3", "ev4"]


def test_cli_decontaminate_mixed_schemas(tmp_path, spark):
    """The train corpus (clip_id/transcript) and eval table
    (doc_id/text) resolve their column pairs INDEPENDENTLY (the
    review-found crash: eval's names were applied to the train side)."""
    import json

    from record_deduplication_spark.cli import main
    from record_deduplication_spark.datagen import generate_clips

    clips_pdf, _ = generate_clips(n_clips=80, seed=21)
    trainp = str(tmp_path / "train2.parquet")
    spark.createDataFrame(clips_pdf).write.parquet(trainp)
    leaked_text = clips_pdf["transcript"].iloc[0]
    ev = spark.createDataFrame(
        [(0, leaked_text),
         (1, "entirely novel doc text with zero overlap anywhere truly")],
        ["doc_id", "text"])
    evalp = str(tmp_path / "eval2.parquet")
    ev.write.parquet(evalp)
    jsonp = str(tmp_path / "decon2.json")
    assert main(["--input", trainp, "--decontaminate-eval", evalp,
                 "--decontaminate-ngram", "4", "--json-out", jsonp]) == 0
    stats = json.loads(open(jsonp).read())
    assert stats["n_flagged"] == 1 and stats["n_eval_rows"] == 2
