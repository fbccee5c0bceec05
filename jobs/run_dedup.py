"""spark-submit job script.

    spark-submit --master <cluster-master> \
        --py-files dist/record_deduplication_spark.zip \
        jobs/run_dedup.py --input <clips table/path> --workdir <ckpt dir>

The engine package arrives via --py-files; this file is only the
driver-side entry shim (spark-submit needs a script, not a module).
"""

from record_deduplication_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
