"""Compute the summary block of a graded-scaling JSON from its per-leg runs.

graded_scaling_r6.py only writes `efficiency` / `best_elapsed_sec` /
`outputs_identical` when the whole campaign finishes; each leg, however,
is flushed to disk as it completes. This tool recomputes the summary from
whatever runs exist, so a campaign cut short by the session clock still
yields a graded artifact (min-of-available-reps, clearly labeled).

Usage: python scripts/summarize_scaling.py [path (default SCALING_r06.json)]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def summarize(state: dict) -> dict:
    runs = {k: v for k, v in state["runs"].items() if v}
    outs = {
        (r["pairs"], r["multi_clusters"]) for v in runs.values() for r in v
    }
    state["outputs_identical"] = len(outs) == 1
    state["output"] = sorted(outs)[0] if len(outs) == 1 else sorted(outs)

    best = {k: min(r["elapsed_sec"] for r in v) for k, v in runs.items()}
    state["best_elapsed_sec"] = best
    state["all_elapsed_sec"] = {
        k: [r["elapsed_sec"] for r in v] for k, v in runs.items()
    }

    def eff(lo: str, hi: str, ratio: float):
        if lo in best and hi in best:
            return round(best[lo] / best[hi] / ratio, 3)
        return None

    state["efficiency"] = {
        "n_to_2n_local_8_16": eff("local8", "local16", 2),
        "two_n_to_4n_local_16_32": eff("local16", "local32", 2),
        "n_to_4n_local_8_32": eff("local8", "local32", 4),
        "multi_executor_1_to_4": eff("lc1x8", "lc4x8", 4),
    }
    rows = state["rows"]
    state["throughput_docs_per_sec"] = {
        k: round(rows / best[k], 1) for k in best
    }
    state["reps_completed"] = {k: len(v) for k, v in state["runs"].items()}
    return state


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "SCALING_r06.json")
    with open(path) as f:
        state = json.load(f)
    state = summarize(state)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, path)
    print(json.dumps({
        "best": state["best_elapsed_sec"],
        "efficiency": state["efficiency"],
        "outputs_identical": state["outputs_identical"],
        "reps_completed": state["reps_completed"],
    }))


if __name__ == "__main__":
    main()
