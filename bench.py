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

    n_reps = int(os.environ.get("BENCH_REPS", "3"))
    all_queries = Q.queries()
    times: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    total = 0.0

    # warm the JVM/Python-worker pools so per-query numbers measure the
    # queries, not process spin-up
    spark.range(1000).select(F.sum("id")).collect()

    # min-of-N per query: this sandbox is a shared-host VM with disclosed
    # 2.5x run-to-run variance, and single-run numbers made noise
    # indistinguishable from regressions across rounds (BENCH.md). Noise
    # here is one-sided (contention only adds time), so min is the
    # machine-independent estimator; raw reps are published alongside.
    for name in HEADLINE:
        fn = all_queries[name]
        rep_times = []
        for _ in range(n_reps):
            if name == "doc_blocking_pairs":
                # this query BUILDS the session pair-table memo: reset it
                # per rep so min-of-N measures the cold compute, not a
                # memo read (its consumers, e.g. doc_pair_score_buckets,
                # deliberately measure warm — the session cost model)
                Q.reset_doc_pairs_cache()
            t0 = time.time()
            df = fn(spark, sf_dir)
            # checksum over every column so Catalyst cannot prune computed
            # columns the way a bare count() would — times measure real work
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.xxhash64(*[F.col(c) for c in df.columns]).cast(
                        "decimal(38,0)"
                    )
                ).alias("h"),
            ).collect()[0]
            rep_times.append(round(time.time() - t0, 3))
        dt = min(rep_times)
        times[name] = dt
        reps[name] = rep_times
        total += dt
        print(
            f"# {name}: min {dt:.2f}s of {rep_times} ({row['n']} rows)",
            file=sys.stderr,
        )

    # web dedup pipeline on the synthetic corpus
    pages, _tp, _tc = corpus_dataframes(spark, SynthConfig(n_docs=n_docs, seed=42))
    pages = pages.persist()
    pages.count()
    rep_times = []
    for _ in range(n_reps):
        t0 = time.time()
        result = run_pipeline(spark, pages, PipelineConfig())
        n_pairs = result["pairs"].count()
        n_clustered = result["clusters"].count()
        result["pairs"].unpersist()
        rep_times.append(round(time.time() - t0, 3))
    dt = min(rep_times)
    times["web_dedup_pipeline"] = dt
    reps["web_dedup_pipeline"] = rep_times
    total += dt
    docs_per_sec = n_docs / dt
    print(
        f"# web_dedup_pipeline: min {dt:.2f}s of {rep_times} ({n_docs} docs, "
        f"{n_pairs} pairs, {n_clustered} rows clustered, "
        f"{docs_per_sec:.1f} docs/s)",
        file=sys.stderr,
    )

    out = {
        "metric": "headline_queries_plus_web_dedup_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "reps": reps,
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
