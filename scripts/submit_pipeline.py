"""spark-submit entry point for the dedup pipeline (north rule: 'runs via
spark-submit --py-files on multi-executor clusters').

This file deliberately does NOT import ufo_dedup_spark at module top —
imports happen inside main() AFTER the zip shipped via --py-files is on
sys.path, which is exactly the failure mode --py-files deployment has to
get right (executors unpickle UDFs by importing the module from the
shipped zip).

Cluster usage:
  python -c "from ufo_dedup_spark.session import _package_zip; print(_package_zip())"
  spark-submit --master <cluster> --py-files /tmp/ufo_dedup_spark_pyfiles.zip \\
      scripts/submit_pipeline.py --pages lake.db.pages --out lake.db.clusters

Local smoke (what tests/test_submit.py runs):
  spark-submit --master 'local[4]' --py-files <zip> \\
      scripts/submit_pipeline.py --synth-rows 2000 --out /tmp/clusters
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default=None,
                    help="Iceberg table identifier or parquet path")
    ap.add_argument("--synth-rows", type=int, default=None,
                    help="generate a synthetic corpus instead of --pages")
    ap.add_argument("--out", required=True,
                    help="Iceberg table identifier or parquet path for "
                         "cluster assignments")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ufo-dedup-submit").getOrCreate()

    # imported AFTER --py-files distribution (see module docstring)
    from ufo_dedup_spark.pipeline import PipelineConfig, run_pipeline
    from ufo_dedup_spark.sources.tables import read_pages, write_clusters
    from ufo_dedup_spark.synth import SynthConfig, corpus_dataframes

    if args.synth_rows:
        pages, _, _ = corpus_dataframes(spark, SynthConfig(n_docs=args.synth_rows))
        use_extractor = True
    else:
        pages = read_pages(spark, args.pages)
        use_extractor = "html" in pages.columns

    result = run_pipeline(spark, pages, PipelineConfig(), use_extractor=use_extractor)
    write_clusters(result["clusters"], args.out)
    n = spark.read.parquet(args.out).count() if "/" in args.out else None
    print(json.dumps({"status": "ok", "out": args.out, "rows_written": n}))
    spark.stop()


if __name__ == "__main__":
    main()
