"""Pin the verify-phase shuffle-byte claim with measured numbers.

Round 4 restructured verification so full document text stays OUT of the
big candidate join (token arrays + counts only) and moves only through a
narrow prefix-family join; the claim was "~half the phase's shuffle
bytes", from plan reasoning. This probe measures it: it runs the SAME
candidate set through (A) the production verify shape and (B) the round-3
shape (lowered text carried through both exchanges of the big join), each
in its own subprocess with the Spark event log enabled, and sums
ShuffleBytesWritten over the app. One JSON line.

Usage: python scripts/verify_shuffle_bytes.py [--rows 20000] [--cores 16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from ufo_dedup_spark.session import build_session
from ufo_dedup_spark.pipeline import (
    PipelineConfig, candidate_pairs, prepare_documents, prepare_tokens,
    verify_candidate_pairs,
)
from ufo_dedup_spark.synth import SynthConfig, corpus_dataframes

shape = {shape!r}
spark = build_session(
    app_name="verify-shuffle-" + shape,
    master="local[{cores}]",
    extra_conf={{
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": {evdir!r},
        # default rolling logs are zstd-compressed — keep them plain json
        # so the parent can parse without a zstd dependency
        "spark.eventLog.compress": "false",
        # force the EXCHANGE plan: at probe scale every side fits under the
        # broadcast threshold and both shapes would measure ~0 shuffle
        # bytes; at production scale (1M+ docs) the token/text sides are
        # far past broadcastable and the join shuffles — this is the shape
        # the round-4 claim is about
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }},
)
pages, _, _ = corpus_dataframes(spark, SynthConfig(n_docs={rows}, seed=42))
cfg = PipelineConfig()
docs = prepare_documents(pages, use_extractor=False).localCheckpoint(eager=True)
cands = candidate_pairs(docs, cfg).localCheckpoint(eager=True)
prepped = prepare_tokens(docs).localCheckpoint(eager=True)

# reset shuffle accounting scope: everything before this line is setup;
# the event log records per-stage metrics, and we bracket the verify jobs
# by job group so only they are summed.
sc = spark.sparkContext
sc.setJobGroup("verify_phase", "verify only")
if shape == "production":
    out = verify_candidate_pairs(cands, docs, cfg, prepped=prepped)
else:
    # round-3 shape: lowered text rides the big join on BOTH sides, the
    # starts-with rule is evaluated inline for every candidate pair
    a = prepped.join(
        docs.select("id", F.lower(F.trim("text")).alias("_t")), "id"
    ).select(
        F.col("id").alias("id_a"), F.col("_tok").alias("_tok_a"),
        F.col("_n").alias("_na"), F.col("_t").alias("_ta"),
    )
    b = prepped.join(
        docs.select("id", F.lower(F.trim("text")).alias("_t")), "id"
    ).select(
        F.col("id").alias("id_b"), F.col("_tok").alias("_tok_b"),
        F.col("_n").alias("_nb"), F.col("_t").alias("_tb"),
    )
    j = cands.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect(F.col("_tok_a"), F.col("_tok_b")))
    union = F.col("_na") + F.col("_nb") - inter
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")
                 ).otherwise(F.lit(0.0))
    is_pfx = (
        (F.length("_ta") >= 20) & (F.length("_tb") >= 20)
        & (F.col("_ta").startswith(F.col("_tb"))
           | F.col("_tb").startswith(F.col("_ta")))
    )
    # exact 0.95 on a starts-with hit, matching production (round 6:
    # reference dedup.py:108-117 early-returns 0.95 before Jaccard)
    score = F.when(is_pfx, F.lit(0.95)).otherwise(jac)
    out = j.select(
        "id_a", "id_b", score.alias("score"), "method"
    ).filter(F.col("score") >= cfg.verify_threshold)
n = out.count()
# decimal(38,0) sum: a long sum of ~1e5 xxhash64 values overflows int64
# under ANSI mode; decimal38 has ~10 spare orders of magnitude here
chk = out.agg(F.sum(F.xxhash64("id_a", "id_b",
                               F.round("score", 9).cast("string"))
                    .cast("decimal(38,0)"))).collect()[0][0]
sc.cancelJobGroup("verify_phase")
print(json.dumps({{"pairs": n, "checksum": str(chk)}}))
spark.stop()
"""


def run_shape(shape: str, rows: int, cores: int) -> dict:
    evdir = tempfile.mkdtemp(prefix=f"ev_{shape}_")
    code = _CHILD.format(
        repo=REPO, shape=shape, rows=rows, cores=cores, evdir=evdir
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-3000:])
        raise SystemExit(1)
    res = json.loads(
        [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    )
    # sum shuffle write bytes of stages belonging to the verify job group:
    # SparkListenerJobStart carries the group in properties; stage ids of
    # those jobs are summed from their SparkListenerStageCompleted metrics
    verify_stages: set[int] = set()
    stage_bytes: dict[int, int] = {}
    # Spark 4 event logs are rolling DIRECTORIES (eventlog_v2_<app>/...)
    paths = [
        os.path.join(root, name)
        for root, _, names in os.walk(evdir)
        for name in names
        if not name.startswith("appstatus_")
    ]
    for path in paths:
        with open(path, errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(ev, dict):
                    continue
                k = ev.get("Event")
                if k == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    if props.get("spark.jobGroup.id") == "verify_phase":
                        for sid in ev.get("Stage IDs", []):
                            verify_stages.add(sid)
                elif k == "SparkListenerStageCompleted":
                    info = ev.get("Stage Info", {})
                    acc = 0
                    for a in info.get("Accumulables", []):
                        if a.get("Name") in (
                            "internal.metrics.shuffle.write.bytesWritten",
                        ):
                            acc += int(a.get("Value", 0))
                    stage_bytes[info.get("Stage ID")] = acc
    total = sum(stage_bytes.get(s, 0) for s in verify_stages)
    res["shuffle_write_bytes"] = total
    res["shuffle_write_mb"] = round(total / 1e6, 1)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    prod = run_shape("production", args.rows, args.cores)
    naive = run_shape("round3", args.rows, args.cores)
    assert prod["pairs"] == naive["pairs"] and prod["checksum"] == naive["checksum"], (
        "shapes must verify the identical pair set",
        prod,
        naive,
    )
    print(json.dumps({
        "metric": "verify_phase_shuffle_bytes",
        "rows": args.rows,
        "pairs": prod["pairs"],
        "production_mb": prod["shuffle_write_mb"],
        "text_through_big_join_mb": naive["shuffle_write_mb"],
        "reduction": round(
            1 - prod["shuffle_write_bytes"] / max(naive["shuffle_write_bytes"], 1),
            3,
        ),
        "outputs_identical": True,
    }))


if __name__ == "__main__":
    main()
