"""Shuffle-bandwidth ceiling of this box: a pure-Spark join+aggregate with
the same shape as the engine's verification phase (pair table joined twice
against an array-payload table, array_intersect scored), built only from
spark.range — no engine code, no Python UDFs, no skew.

Whatever scaling THIS job gets N -> 4N cores is the ceiling the box grants
any shuffle-heavy stage in one JVM (one memory bus, one shuffle disk);
cpu_calibration.py measures the pure-arithmetic ceiling, this measures the
exchange-bound one.

Usage: python scripts/shuffle_calibration.py [--pairs 4000000] [--docs 400000]
Prints one JSON line with per-level seconds and the efficiency ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(master: str, n_pairs: int, n_docs: int) -> float:
    """One fresh leg (fresh driver + executor JVMs); returns elapsed
    seconds of the timed join job."""
    code = f"""
import sys, time
sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from ufo_dedup_spark.session import build_session

spark = build_session(app_name="shuffle-cal", master={master!r},
                      shuffle_partitions=64,
                      extra_conf={{
                          # force real exchanges: the array table is ~1GB
                          # and a mis-estimated broadcast both fails and
                          # measures the wrong thing
                          "spark.sql.autoBroadcastJoinThreshold": "-1",
                      }})
spark.sparkContext.setLogLevel("ERROR")

docs = spark.range({n_docs}).select(
    F.col("id"),
    F.transform(
        F.sequence(F.lit(0), F.lit(299)),
        lambda i: F.xxhash64(F.col("id") * 300 + i),
    ).alias("toks"),
).localCheckpoint(eager=True)
pairs = spark.range({n_pairs}).select(
    F.pmod(F.xxhash64("id"), F.lit({n_docs})).alias("id_a"),
    F.pmod(F.xxhash64("id", F.lit(1)), F.lit({n_docs})).alias("id_b"),
).localCheckpoint(eager=True)

t0 = time.time()
a = docs.select(F.col("id").alias("id_a"), F.col("toks").alias("ta"))
b = docs.select(F.col("id").alias("id_b"), F.col("toks").alias("tb"))
out = (
    pairs.join(a, "id_a").join(b, "id_b")
    .select(F.size(F.array_intersect("ta", "tb")).alias("n"))
    .agg(F.sum("n"))
    .collect()
)
print("ELAPSED", time.time() - t0)
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-2000:])
        raise SystemExit(1)
    for line in out.stdout.splitlines():
        if line.startswith("ELAPSED"):
            return float(line.split()[1])
    raise SystemExit("no ELAPSED line")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4_000_000)
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--mode", choices=["local", "local-cluster"], default="local",
        help="local = one JVM, K threads. local-cluster = the SAME "
             "zero-engine-code job across separate executor JVMs on this "
             "host (1 vs --executors-high executors at a fixed "
             "per-executor shape): the control for the engine's "
             "multi-executor scaling number — whatever a plain Spark "
             "shuffle join loses when its exchange crosses JVM "
             "boundaries on one box is machine ceiling, not engine.")
    ap.add_argument("--exec-cores", type=int, default=8)
    ap.add_argument("--exec-mem-mb", type=int, default=16384)
    ap.add_argument("--executors-high", type=int, default=4)
    args = ap.parse_args()

    if args.mode == "local-cluster":
        args.low = args.exec_cores
        args.high = args.executors_high * args.exec_cores
        low_master = f"local-cluster[1,{args.exec_cores},{args.exec_mem_mb}]"
        high_master = (
            f"local-cluster[{args.executors_high},{args.exec_cores},"
            f"{args.exec_mem_mb}]"
        )
    else:
        low_master = f"local[{args.low}]"
        high_master = f"local[{args.high}]"

    low = min(
        run_leg(low_master, args.pairs, args.docs) for _ in range(args.reps)
    )
    high = min(
        run_leg(high_master, args.pairs, args.docs) for _ in range(args.reps)
    )
    ratio = args.high / args.low
    print(
        json.dumps(
            {
                "metric": "shuffle_join_ceiling",
                "mode": args.mode,
                "pairs": args.pairs,
                "docs": args.docs,
                "low_cores": args.low,
                "high_cores": args.high,
                "low_master": low_master,
                "high_master": high_master,
                "low_sec": round(low, 2),
                "high_sec": round(high, 2),
                "speedup": round(low / high, 3),
                "efficiency": round(low / high / ratio, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
