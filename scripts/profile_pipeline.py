"""Phase-level wall-time profile of the dedup pipeline at one parallelism
level. Used to find which phases scale with cores and which are stuck
serial (the scaling-efficiency debugging loop).

Usage: python scripts/profile_pipeline.py --rows 100000 --master local[32]
Prints one JSON line: {"phases": {...}, "total": ...}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from ufo_dedup_spark.operators.connected_components import (  # noqa: E402
    connected_components,
)
from ufo_dedup_spark.operators.pairs import first_wins  # noqa: E402
from ufo_dedup_spark.pipeline import (  # noqa: E402
    METHOD_PRIORITY,
    PipelineConfig,
    candidate_pairs,
    prepare_documents,
    substring_pairs,
    verify_candidate_pairs,
)
from ufo_dedup_spark.session import build_session  # noqa: E402
from ufo_dedup_spark.synth import SynthConfig, corpus_dataframes  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100000)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    spark = build_session(app_name="profile", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig()

    pages, _, _ = corpus_dataframes(spark, SynthConfig(n_docs=args.rows, seed=42))
    pages = pages.persist()
    pages.count()

    phases = {}
    jobs = {}

    def _njobs():
        return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()

    def _gc_ms():
        beans = spark.sparkContext._jvm.java.lang.management.ManagementFactory \
            .getGarbageCollectorMXBeans()
        return sum(b.getCollectionTime() for b in beans)

    t_all = time.time()
    j_all = _njobs()
    gc0 = _gc_ms()

    t = time.time(); j = _njobs()
    docs = prepare_documents(pages, use_extractor=True).localCheckpoint(eager=True)
    phases["docs_extract"] = round(time.time() - t, 2)
    jobs["docs_extract"] = _njobs() - j

    t = time.time(); j = _njobs()
    cands = candidate_pairs(docs, cfg).localCheckpoint(eager=True)
    phases["candidates"] = round(time.time() - t, 2)
    jobs["candidates"] = _njobs() - j

    t = time.time(); j = _njobs()
    verified = verify_candidate_pairs(cands, docs, cfg).localCheckpoint(eager=True)
    phases["verify"] = round(time.time() - t, 2)
    jobs["verify"] = _njobs() - j

    t = time.time(); j = _njobs()
    cheap_cc = connected_components(
        verified.filter(F.col("score") >= cfg.cluster_threshold).select(
            "id_a", "id_b"
        )
    ).localCheckpoint(eager=True)
    phases["cheap_cc"] = round(time.time() - t, 2)
    jobs["cheap_cc"] = _njobs() - j

    t = time.time(); j = _njobs()
    sub = substring_pairs(
        docs, cfg, exclude=verified, exclude_clusters=cheap_cc
    ).localCheckpoint(eager=True)
    phases["substring"] = round(time.time() - t, 2)
    jobs["substring"] = _njobs() - j

    t = time.time(); j = _njobs()
    all_pairs = verified.unionByName(sub)
    prio = F.when(F.lit(False), F.lit(0))
    for m, p in METHOD_PRIORITY.items():
        prio = prio.when(F.col("method") == m, F.lit(p))
    pairs = first_wins(
        all_pairs.withColumn("priority", prio.otherwise(F.lit(99)))
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    phases["pairs_dedup"] = round(time.time() - t, 2)
    jobs["pairs_dedup"] = _njobs() - j

    t = time.time(); j = _njobs()
    edges = pairs.filter(
        (F.col("score") >= cfg.cluster_threshold) | (F.col("method") == "substring")
    )
    cc = connected_components(edges.select("id_a", "id_b"))
    clusters = (
        docs.select("id", "url")
        .join(cc, on="id", how="left")
        .select(
            "id", "url", F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id")
        )
    )
    n_rows = clusters.count()
    phases["final_cc"] = round(time.time() - t, 2)
    jobs["final_cc"] = _njobs() - j

    print(json.dumps({
        "master": args.master,
        "rows": args.rows,
        "phases": phases,
        "jobs": jobs,
        "n_jobs": _njobs() - j_all,
        "gc_sec": round((_gc_ms() - gc0) / 1000.0, 2),
        "total": round(time.time() - t_all, 2),
        "pairs": n_pairs,
        "clustered": n_rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
