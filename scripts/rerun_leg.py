"""Re-run a single leg of a finished graded-scaling campaign and merge the
rep into its JSON evidence file (min-of-reps summary recomputed).

Exists because a 4M local-cluster leg takes ~45 min and can be lost to a
host-side OOM kill (exit 137) if anything heavy shares the box — rather
than replay the whole campaign, replay the one lost leg on a quiet box.

Usage: python scripts/rerun_leg.py --leg lc1x4 --out SCALING_r06_lc4.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from graded_scaling_r6 import ALL_LEGS, summarize  # noqa: E402
from scaling_bench import run_level  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", required=True, choices=sorted(ALL_LEGS))
    ap.add_argument("--out", required=True,
                    help="campaign JSON (relative paths resolve to repo root)")
    args = ap.parse_args()

    out_path = args.out if os.path.isabs(args.out) else os.path.join(
        REPO, args.out)
    with open(out_path) as f:
        state = json.load(f)

    master, _cores = ALL_LEGS[args.leg]
    t0 = time.time()
    r = run_level(master, state["rows"], state.get("shuffle_partitions"))
    r["leg_wall_sec"] = round(time.time() - t0, 1)
    r["cycle"] = "rerun"
    r["utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    state["runs"].setdefault(args.leg, []).append(r)

    summarize(state)
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, out_path)
    print(json.dumps({
        "leg": args.leg,
        "elapsed_sec": r["elapsed_sec"],
        "best": state["best_elapsed_sec"],
        "efficiency": state["efficiency"],
        "outputs_identical": state["outputs_identical"],
    }))


if __name__ == "__main__":
    main()
