"""Local twin of the driver's correctness gate: run each paired query
on Spark and DuckDB at sf0.001 and compare row count + columns +
order-insensitive values (NaN-safe, float-rounded the same way the
queries themselves round)."""

import duckdb
import pandas as pd
import pytest

from record_deduplication_spark.analysis import gate_queries as G

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in G.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


# the one shared definition of the canonical row form (also used by
# jobs/correctness_sweep.py) — a local copy could drift and make the
# sf1 sweep and this gate compare mean different things by "green"
_canon = G.canon_rows


@pytest.mark.parametrize("name", G.all_names())
def test_paired_query_matches_duckdb(spark, duck, name):
    ours = G.run_spark(spark, SF_DIR, name).toPandas()
    theirs = duck.sql(G.duckdb_sql(name)).df()
    assert sorted(ours.columns) == sorted(theirs.columns), (
        f"{name}: columns {list(ours.columns)} vs {list(theirs.columns)}")
    a, b = _canon(ours), _canon(theirs)
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert not mism, f"{name}: first mismatches {[(a[i], b[i]) for i in mism]}"


@pytest.mark.parametrize("name", ["minhash_lsh_pairs", "shingle_jaccard_pairs",
                                  "substring_run_pairs",
                                  "cosine_topk", "simhash_fingerprints",
                                  # exact_dup_groups was vacuous in r1/r2
                                  # (0 rows both engines); it now plants
                                  # dups and must never be degenerate again
                                  # (r4: also carries the prefix_fp leg)
                                  "exact_dup_groups", "review_json_flatten",
                                  # planted contamination: must stay non-vacuous
                                  "ngram_decontamination"])
def test_interesting_queries_nonempty(spark, name):
    assert G.run_spark(spark, SF_DIR, name).count() > 0, f"{name} degenerate (0 rows)"
