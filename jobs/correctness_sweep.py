"""Local twin of the driver's 50-gate correctness check, at any SF.

Runs every `__spark_entry__.queries()` gate on Spark AND its
`oracle_sql()` DuckDB twin against the same parquet directory, and
writes a CORRECTNESS_r{N}.json-shaped artifact
(rows_match/schema_match/hash_match per gate). The driver only runs
this at sf0.01; VERDICT r4 #2 asks for the sweep at sf1 (~10x sf0.1,
synthesized by jobs/upscale_sf.py) so gate parity is demonstrated
beyond fixture-sized inputs.

Canonicalization mirrors tests/test_gate_queries.py (the local twin of
the driver's compare): columns sorted by name, floats formatted %.9g
NaN-safe, rows sorted; the "hash" is equality of the canonical row
lists (strictly stronger than comparing digests of them).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sweep(sf_dir: str, out_path: str, cpus: int = 16) -> dict:
    import duckdb

    import __spark_entry__ as E
    from record_deduplication_spark.analysis import gate_queries as G
    from record_deduplication_spark.analysis.gate_queries import \
        canon_rows as _canon
    from record_deduplication_spark.session import build_session

    spark = build_session(app="correctness_sweep", master=f"local[{cpus}]",
                          shuffle_partitions=int(cpus))
    con = duckdb.connect()
    for t in G.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries, oracles = E.queries(), E.oracle_sql()
    results: dict[str, dict] = {}
    for name in sorted(queries):
        t0 = time.time()
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None, "oracle_rows": None,
               "err": None}
        try:
            ours = queries[name](spark, sf_dir).toPandas()
            theirs = con.sql(oracles[name]).df()
            rec["spark_rows"], rec["oracle_rows"] = len(ours), len(theirs)
            rec["rows_match"] = len(ours) == len(theirs)
            rec["schema_match"] = sorted(ours.columns) == sorted(theirs.columns)
            if rec["rows_match"] and rec["schema_match"]:
                rec["hash_match"] = _canon(ours) == _canon(theirs)
        except Exception as exc:  # noqa: BLE001 — artifact records the error
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        status = "OK " if rec["hash_match"] else "FAIL"
        print(f"{status} {name} ({rec['sec']}s, rows {rec['spark_rows']})",
              flush=True)
    spark.stop()
    con.close()

    n_green = sum(r["hash_match"] for r in results.values())
    artifact = {"sf_dir": sf_dir, "n_gates": len(results), "n_green": n_green,
                "gates": results}
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"{n_green}/{len(results)} green -> {out_path}", flush=True)
    return artifact


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "data", "sf1")
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH",
                                                             "CORRECTNESS_sf1.json")
    sweep(sf_dir, out, int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
