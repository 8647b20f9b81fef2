"""Sub-step timing of the substring phase (the engine's worst scaler):
winnow fingerprints, bucket pairs, exclusion joins, text join + LCS UDF,
each materialized separately at one parallelism level.

Usage: python scripts/substring_phase_bench.py --rows 200000 --master local[32]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from ufo_dedup_spark.functions.hashing import make_winnow_udf  # noqa: E402
from ufo_dedup_spark.operators.connected_components import (  # noqa: E402
    connected_components,
)
from ufo_dedup_spark.operators.minhash_lsh import pairs_within_groups  # noqa: E402
from ufo_dedup_spark.operators.substring import (  # noqa: E402
    verify_substring_pairs,
)
from ufo_dedup_spark.pipeline import (  # noqa: E402
    PipelineConfig,
    candidate_pairs,
    prepare_documents,
    verify_candidate_pairs,
)
from ufo_dedup_spark.session import build_session  # noqa: E402
from ufo_dedup_spark.synth import SynthConfig, corpus_dataframes  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200000)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    spark = build_session(app_name="substring-bench", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = PipelineConfig()

    pages, _, _ = corpus_dataframes(spark, SynthConfig(n_docs=args.rows, seed=42))
    docs = prepare_documents(pages, use_extractor=True).localCheckpoint(eager=True)

    # upstream state the substring phase consumes (not timed here)
    cands = candidate_pairs(docs, cfg).localCheckpoint(eager=True)
    verified = verify_candidate_pairs(cands, docs, cfg).localCheckpoint(eager=True)
    cheap_cc = connected_components(
        verified.filter(F.col("score") >= cfg.cluster_threshold).select(
            "id_a", "id_b"
        )
    ).localCheckpoint(eager=True)

    steps = {}

    t = time.time()
    winnow = make_winnow_udf(cfg.substring_gram, cfg.substring_window)
    fps = docs.select(
        F.col("id").alias("_id"), F.explode(winnow(F.col("text"))).alias("fp")
    ).localCheckpoint(eager=True)
    n_fp = fps.count()
    steps["winnow_fingerprints"] = round(time.time() - t, 2)

    t = time.time()
    sub_cands = (
        pairs_within_groups(fps, ["fp"], "_id", cfg.all_pairs_cap)
        .select("id_a", "id_b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_cands = sub_cands.count()
    steps["bucket_pairs"] = round(time.time() - t, 2)

    t = time.time()
    pruned = sub_cands.join(
        verified.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti"
    )
    ca = cheap_cc.select(F.col("id").alias("id_a"), F.col("cluster_id").alias("_ca"))
    cb = cheap_cc.select(F.col("id").alias("id_b"), F.col("cluster_id").alias("_cb"))
    pruned = (
        pruned.join(ca, "id_a", "left")
        .join(cb, "id_b", "left")
        .filter(
            F.col("_ca").isNull()
            | F.col("_cb").isNull()
            | (F.col("_ca") != F.col("_cb"))
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_pruned = pruned.count()
    steps["exclusion_joins"] = round(time.time() - t, 2)

    t = time.time()
    out = verify_substring_pairs(pruned, docs, min_span=cfg.substring_min_span)
    n_out = out.count()
    steps["text_join_lcs"] = round(time.time() - t, 2)

    print(
        json.dumps(
            {
                "master": args.master,
                "rows": args.rows,
                "steps": steps,
                "fingerprints": n_fp,
                "candidates": n_cands,
                "pruned_candidates": n_pruned,
                "verified_pairs": n_out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
