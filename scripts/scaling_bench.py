"""Scaling-efficiency evidence: the identical dedup job at two parallelism
levels (BASELINE.json north rule; no real cluster in this sandbox, so N vs
4N executors is evidenced as local[8] vs local[32] on identical input).

Each level runs in a FRESH subprocess/JVM so nothing is warm-shared.
Prints one JSON line and (with --update-bench-md) rewrites the measured
section of BENCH.md.

Usage: python scripts/scaling_bench.py [--rows 50000] [--update-bench-md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(master: str, rows: int) -> dict:
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "run_pipeline.py"),
            "--rows", str(rows), "--master", master, "--json",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    if out.returncode != 0:
        sys.stderr.write(
            f"--- {master} leg failed (rc={out.returncode}); stderr tail ---\n"
            + "\n".join(out.stderr.splitlines()[-30:])
            + "\n"
        )
        raise SystemExit(1)
    last = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=50000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--update-bench-md", action="store_true")
    args = ap.parse_args()

    low = run_level(f"local[{args.low}]", args.rows)
    high = run_level(f"local[{args.high}]", args.rows)

    ratio = args.high / args.low
    speedup = low["elapsed_sec"] / high["elapsed_sec"]
    efficiency = speedup / ratio

    result = {
        "metric": "scaling_efficiency",
        "rows": args.rows,
        "low": {"cores": args.low, **low},
        "high": {"cores": args.high, **high},
        "speedup": round(speedup, 3),
        "core_ratio": ratio,
        "efficiency": round(efficiency, 3),
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    print(json.dumps(result))

    if args.update_bench_md:
        md = f"""## Measured scaling (local[{args.low}] vs local[{args.high}], identical input)

| level | cores | rows | elapsed (s) | docs/sec |
|---|---|---|---|---|
| N | {args.low} | {args.rows} | {low['elapsed_sec']} | {low['docs_per_sec']} |
| 4N | {args.high} | {args.rows} | {high['elapsed_sec']} | {high['docs_per_sec']} |

speedup = {speedup:.2f}x over a {ratio:.0f}x core ratio ->
**scaling efficiency = {efficiency:.3f}** (target >= 0.8)

Both levels run the full web-dedup pipeline (extract -> MinHash/SimHash/LSH
-> prefix/winnow candidates -> exact verification -> substring LCS ->
union-find clustering) on the identical deterministic synthetic corpus in a
fresh JVM; corpus generation and Spark startup are excluded from the timed
window. Pair/cluster outputs are identical at both levels
(pairs={low['pairs']}, multi_clusters={low['multi_clusters']}).
"""
        path = os.path.join(REPO, "BENCH.md")
        existing = ""
        if os.path.exists(path):
            with open(path) as f:
                existing = f.read()
            head = existing.split("## Measured scaling", 1)[0].rstrip()
        else:
            head = "# BENCH — measured performance evidence\n"
        with open(path, "w") as f:
            f.write(head + "\n\n" + md)


if __name__ == "__main__":
    main()
