"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR plus the web
dedup pipeline on the deterministic synthetic corpus.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "throughput": {...}}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), BENCH_PIPELINE_DOCS (default 20000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from ufo_dedup_spark import queries as Q  # noqa: E402
from ufo_dedup_spark.pipeline import PipelineConfig, run_pipeline  # noqa: E402
from ufo_dedup_spark.session import build_session  # noqa: E402
from ufo_dedup_spark.synth import SynthConfig, corpus_dataframes  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "top_customer_revenue",
    "customer_top_orders",
    "events_hourly",
    "doc_stats",
    "doc_blocking_pairs",
    "doc_pair_score_buckets",
    "top_similar_embeddings",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_docs = int(os.environ.get("BENCH_PIPELINE_DOCS", "20000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = build_session(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    all_queries = Q.queries()
    times: dict[str, float] = {}
    total = 0.0

    # warm the JVM/Python-worker pools so per-query numbers measure the
    # queries, not process spin-up
    spark.range(1000).select(F.sum("id")).collect()

    for name in HEADLINE:
        fn = all_queries[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        # checksum over every column so Catalyst cannot prune computed
        # columns the way a bare count() would — times measure real work
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
            ).alias("h"),
        ).collect()[0]
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s ({row['n']} rows)", file=sys.stderr)

    # web dedup pipeline on the synthetic corpus
    pages, _tp, _tc = corpus_dataframes(spark, SynthConfig(n_docs=n_docs, seed=42))
    pages = pages.persist()
    pages.count()
    t0 = time.time()
    result = run_pipeline(spark, pages, PipelineConfig())
    n_pairs = result["pairs"].count()
    n_clustered = result["clusters"].count()
    dt = time.time() - t0
    times["web_dedup_pipeline"] = round(dt, 3)
    total += dt
    docs_per_sec = n_docs / dt
    print(
        f"# web_dedup_pipeline: {dt:.2f}s ({n_docs} docs, {n_pairs} pairs, "
        f"{n_clustered} rows clustered, {docs_per_sec:.1f} docs/s)",
        file=sys.stderr,
    )

    out = {
        "metric": "headline_queries_plus_web_dedup_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "throughput": {
            "web_dedup_docs_per_sec": round(docs_per_sec, 1),
            "pipeline_docs": n_docs,
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
