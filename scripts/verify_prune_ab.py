"""A/B the candidate-touched side prune (PipelineConfig.verify_prune_sides).

Measures the verify phase's shuffle-write bytes and wall seconds with the
prune OFF (default) and ON, on two corpus profiles:

- dense: the default synthetic corpus (most docs appear in >= 1 candidate
  pair — the bench profile, where the prune is expected to be overhead);
- sparse: a mostly-unique corpus (duplicate segments shrunk ~20x, skew
  host off) where few docs are candidate-touched and the prune should
  bound the token-payload exchanges by the touched set.

Each (profile, prune) cell runs in its own subprocess with the event log
enabled. The broadcast threshold is lowered to 4 MB (not disabled): the
production regime this prune targets is multi-million-doc corpora where
the candidate table and the token table are far past broadcastable but
the candidate-touched ID LIST still broadcasts — fully disabling
broadcast would force the prune's own semi-join to exchange the full
token table and measure the mechanism it exists to use, while leaving the
64 MB default would let probe-scale candidate tables broadcast and hide
the exchanges entirely. Outputs are asserted identical between prune
on/off per profile. One JSON line.

Usage: python scripts/verify_prune_ab.py [--rows 100000] [--cores 16]
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
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from ufo_dedup_spark.session import build_session
from ufo_dedup_spark.pipeline import (
    PipelineConfig, candidate_pairs, prepare_documents, prepare_tokens,
    verify_candidate_pairs,
)
from ufo_dedup_spark.synth import SynthConfig, corpus_dataframes

spark = build_session(
    app_name="verify-prune-{profile}-{prune}",
    master="local[{cores}]",
    extra_conf={{
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": {evdir!r},
        "spark.eventLog.compress": "false",
        "spark.sql.autoBroadcastJoinThreshold": str(4 * 1024 * 1024),
        "spark.sql.adaptive.autoBroadcastJoinThreshold": str(4 * 1024 * 1024),
    }},
)
spark.sparkContext.setLogLevel("ERROR")
sc = SynthConfig(n_docs={rows}, seed=42)
if "{profile}" == "sparse":
    sc = SynthConfig(
        n_docs={rows}, seed=42, exact_frac=0.003, near_frac=0.005,
        prefix_frac=0.002, span_frac=0.002, skew_frac=0.0,
    )
pages, _, _ = corpus_dataframes(spark, sc)
cfg = PipelineConfig(verify_prune_sides=("{prune}" == "on"))
docs = prepare_documents(pages, use_extractor=False).localCheckpoint(eager=True)
cands = candidate_pairs(docs, cfg).localCheckpoint(eager=True)
prepped = prepare_tokens(docs).localCheckpoint(eager=True)

scx = spark.sparkContext
scx.setJobGroup("verify_phase", "verify only")
t0 = time.time()
out = verify_candidate_pairs(cands, docs, cfg, prepped=prepped)
n = out.count()
chk = out.agg(F.sum(F.xxhash64("id_a", "id_b",
                               F.round("score", 9).cast("string"))
                    .cast("decimal(38,0)"))).collect()[0][0]
wall = round(time.time() - t0, 2)
scx.cancelJobGroup("verify_phase")
print(json.dumps({{"pairs": n, "checksum": str(chk), "verify_wall_sec": wall}}))
spark.stop()
"""


def run_cell(profile: str, prune: str, rows: int, cores: int) -> dict:
    evdir = tempfile.mkdtemp(prefix=f"ev_prune_{profile}_{prune}_")
    code = _CHILD.format(
        repo=REPO, profile=profile, prune=prune, rows=rows, cores=cores,
        evdir=evdir,
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
    verify_stages: set[int] = set()
    stage_bytes: dict[int, int] = {}
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
    res["shuffle_write_mb"] = round(total / 1e6, 1)
    res["shuffle_write_bytes"] = total
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100000)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    report = {"metric": "verify_prune_ab", "rows": args.rows}
    for profile in ("dense", "sparse"):
        off = run_cell(profile, "off", args.rows, args.cores)
        on = run_cell(profile, "on", args.rows, args.cores)
        assert (off["pairs"], off["checksum"]) == (on["pairs"], on["checksum"]), (
            "prune must not change the verified pair set", profile, off, on,
        )
        report[profile] = {
            "pairs": off["pairs"],
            "off_mb": off["shuffle_write_mb"],
            "on_mb": on["shuffle_write_mb"],
            "byte_reduction": round(
                1 - on["shuffle_write_bytes"] / max(off["shuffle_write_bytes"], 1),
                3,
            ),
            "off_wall_sec": off["verify_wall_sec"],
            "on_wall_sec": on["verify_wall_sec"],
            "outputs_identical": True,
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
