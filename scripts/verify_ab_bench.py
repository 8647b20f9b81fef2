"""Same-session A/B: round-5 verify shape vs the round-6 fused shape.

Round 5's BENCH showed the 20k pipeline at 24.58 s (min of [29.1, 24.6,
40.3]) vs round 4's 21.56 s, with ~0.6 s attributed to the two extra
driver jobs of the reference-faithful starts-with change. Round 6 fuses
the starts-with eligibility + text check INTO the main verify join
(pipeline.verify_candidate_pairs), deleting two exchanges of the
candidate table, the family-id distinct, and the pair-keyed pfx
join-back. This probe runs the FULL 20k pipeline under both shapes in
alternating fresh JVMs (so host drift hits both legs equally) and
reports elapsed + driver-job counts; both shapes are pinned to identical
outputs (the r5 shape is reproduced here with the round-6 exact-0.95
scoring so only the PLAN differs).

Usage: python scripts/verify_ab_bench.py [--rows 20000] [--reps 5]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F

import ufo_dedup_spark.pipeline as P
from ufo_dedup_spark.session import build_session
from ufo_dedup_spark.synth import SynthConfig, corpus_dataframes

shape = {shape!r}

if shape == "r5":
    # round-5 verify shape: main token join, SEPARATE eligibility joins of
    # the candidate table against (id, _pk), semi-join-pruned family text,
    # pair-keyed pfx join-back — scoring pinned to round-6 semantics
    # (exact 0.95) so outputs are identical and only the plan differs.
    def _r5_verify(cands, docs, cfg, prepped=None):
        if prepped is None:
            prepped = P.prepare_tokens(docs).localCheckpoint(eager=True)
        a = prepped.select(
            F.col("id").alias("id_a"),
            F.col("_tok").alias("_tok_a"), F.col("_n").alias("_na"),
        )
        b = prepped.select(
            F.col("id").alias("id_b"),
            F.col("_tok").alias("_tok_b"), F.col("_n").alias("_nb"),
        )
        j = cands.join(a, "id_a").join(b, "id_b")
        inter = F.size(F.array_intersect(F.col("_tok_a"), F.col("_tok_b")))
        union = F.col("_na") + F.col("_nb") - inter
        jac = F.when(
            union > 0, inter.cast("double") / union.cast("double")
        ).otherwise(F.lit(0.0))
        scored = j.select("id_a", "id_b", jac.alias("score"), "method")
        pk = prepped.select("id", "_pk")
        elig = (
            cands.select("id_a", "id_b")
            .join(pk.select(F.col("id").alias("id_a"),
                            F.col("_pk").alias("_pka")), "id_a")
            .join(pk.select(F.col("id").alias("id_b"),
                            F.col("_pk").alias("_pkb")), "id_b")
            .filter(F.col("_pka").isNotNull()
                    & (F.col("_pka") == F.col("_pkb")))
            .select("id_a", "id_b")
        )
        fam_ids = (
            elig.select(F.col("id_a").alias("id"))
            .unionByName(elig.select(F.col("id_b").alias("id")))
            .distinct()
        )
        fam = docs.join(fam_ids, "id", "left_semi").select(
            "id", F.lower(F.trim(F.col("text"))).alias("_t")
        )
        is_prefix = F.col("_ta").startswith(F.col("_tb")) | F.col(
            "_tb"
        ).startswith(F.col("_ta"))
        pfx = (
            elig.join(fam.select(F.col("id").alias("id_a"),
                                 F.col("_t").alias("_ta")), "id_a")
            .join(fam.select(F.col("id").alias("id_b"),
                             F.col("_t").alias("_tb")), "id_b")
            .select("id_a", "id_b", is_prefix.alias("_is_pfx"))
        )
        scored = (
            scored.join(pfx, ["id_a", "id_b"], "left")
            .withColumn(
                "score",
                F.when(F.coalesce(F.col("_is_pfx"), F.lit(False)),
                       F.lit(0.95)).otherwise(F.col("score")),
            )
            .drop("_is_pfx")
        )
        scored = scored.select(
            "id_a", "id_b", "score", "method",
            F.lit("pending").alias("status"),
        )
        return scored.filter(F.col("score") >= cfg.verify_threshold)

    P.verify_candidate_pairs = _r5_verify

spark = build_session(app_name="verify-ab-" + shape, master="local[32]")
pages, _, _ = corpus_dataframes(spark, SynthConfig(n_docs={rows}, seed=42))
pages = pages.persist()
n = pages.count()

def _next_job_id():
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()

j0 = _next_job_id()
t0 = time.time()
res = P.run_pipeline(spark, pages, P.PipelineConfig(), n_docs_hint=n)
n_pairs = res["pairs"].count()
n_cl = (res["clusters"].groupBy("cluster_id").count()
        .filter(F.col("count") > 1).count())
elapsed = time.time() - t0
print(json.dumps({{"shape": shape, "elapsed_sec": round(elapsed, 2),
                   "n_jobs": _next_job_id() - j0, "pairs": n_pairs,
                   "multi_clusters": n_cl}}))
spark.stop()
"""


def run_leg(shape: str, rows: int) -> dict:
    code = _CHILD.format(repo=REPO, shape=shape, rows=rows)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(1)
    return json.loads(
        [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    legs: dict[str, list[dict]] = {"r6": [], "r5": []}
    # alternate shapes so host drift lands on both equally
    for i in range(args.reps):
        for shape in ("r6", "r5"):
            r = run_leg(shape, args.rows)
            legs[shape].append(r)
            sys.stderr.write(f"rep {i} {shape}: {r}\n")

    for shape in ("r6", "r5"):
        ps = {(r["pairs"], r["multi_clusters"]) for r in legs[shape]}
        assert len(ps) == 1, f"{shape} outputs varied: {ps}"
    assert (
        legs["r6"][0]["pairs"] == legs["r5"][0]["pairs"]
        and legs["r6"][0]["multi_clusters"] == legs["r5"][0]["multi_clusters"]
    ), "shapes must produce identical outputs"

    def stats(rs):
        es = sorted(r["elapsed_sec"] for r in rs)
        return {
            "min": es[0],
            "median": es[len(es) // 2],
            "all": [r["elapsed_sec"] for r in rs],
            "n_jobs": rs[0]["n_jobs"],
        }

    r6, r5 = stats(legs["r6"]), stats(legs["r5"])
    print(json.dumps({
        "metric": "verify_shape_ab_20k",
        "rows": args.rows,
        "reps": args.reps,
        "pairs": legs["r6"][0]["pairs"],
        "r6_fused": r6,
        "r5_separate_joins": r5,
        "min_delta_sec": round(r5["min"] - r6["min"], 2),
        "median_delta_sec": round(r5["median"] - r6["median"], 2),
        "jobs_delta": r5["n_jobs"] - r6["n_jobs"],
    }))


if __name__ == "__main__":
    main()
