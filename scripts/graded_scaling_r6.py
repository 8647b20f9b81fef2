"""Round-6 graded scaling evidence: min-of-REPS at 4M docs for every leg.

Runs the full pipeline at local[8] / local[16] / local[32] AND
local-cluster 1x8 / 4x8 (separate executor JVMs), REPS full cycles in
round-robin order (so host drift lands on every leg at every point in
time), with the job-level shuffle-partition count pinned across legs.
Results are flushed to the output JSON after EVERY leg (a killed run
loses at most the in-flight leg). Summary computes min-of-reps
efficiencies and asserts output identity across all legs and reps.

Usage: GS_ROWS=4000000 GS_REPS=2 python scripts/graded_scaling_r6.py
Env: GS_ROWS (default 4000000), GS_REPS (2), GS_OUT
(/root/repo/SCALING_r06.json), GS_SP (64), GS_LEGS (comma list to subset:
local4,local8,local16,local32,lc1x4,lc4x4,lc1x8,lc4x8).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from cpu_calibration import hardware_efficiency  # noqa: E402
from scaling_bench import run_level  # noqa: E402

ALL_LEGS = {
    "local4": ("local[4]", 4),
    "local8": ("local[8]", 8),
    "local16": ("local[16]", 16),
    "local32": ("local[32]", 32),
    # N vs 4N separate executor JVMs at 4 cores each: the 4->16-core span
    # sits inside the host's near-linear region (the 16->32 span is where
    # the shared-VM numpy ceiling collapses to ~0.66), so this pair
    # isolates ENGINE multi-executor scaling from host oversubscription.
    "lc1x4": ("local-cluster[1,4,16384]", 4),
    "lc4x4": ("local-cluster[4,4,16384]", 16),
    "lc1x8": ("local-cluster[1,8,16384]", 8),
    "lc4x8": ("local-cluster[4,8,16384]", 32),
}


def summarize(state: dict) -> None:
    """(Re)compute the derived summary fields of a campaign state dict in
    place: output-identity assertion, min-of-reps per leg, efficiencies,
    throughputs. Idempotent — rerun_leg.py calls this after appending an
    extra rep to a finished campaign file."""
    rows = state["rows"]
    outs = {
        (r["pairs"], r["multi_clusters"])
        for runs in state["runs"].values()
        for r in runs
    }
    state["outputs_identical"] = len(outs) == 1
    state["output"] = sorted(outs)[0] if len(outs) == 1 else sorted(outs)

    best = {
        k: min(r["elapsed_sec"] for r in v)
        for k, v in state["runs"].items() if v
    }
    state["best_elapsed_sec"] = best
    state["all_elapsed_sec"] = {
        k: [r["elapsed_sec"] for r in v] for k, v in state["runs"].items()
    }

    def eff(lo: str, hi: str, ratio: float):
        if lo in best and hi in best:
            return round(best[lo] / best[hi] / ratio, 3)
        return None

    state["efficiency"] = {
        "n_to_2n_local_8_16": eff("local8", "local16", 2),
        "two_n_to_4n_local_16_32": eff("local16", "local32", 2),
        "n_to_4n_local_8_32": eff("local8", "local32", 4),
        "n_to_4n_local_4_16": eff("local4", "local16", 4),
        "multi_executor_1_to_4": eff("lc1x8", "lc4x8", 4),
        "multi_executor_1x4_to_4x4": eff("lc1x4", "lc4x4", 4),
    }
    state["throughput_docs_per_sec"] = {
        k: round(rows / best[k], 1) for k in best
    }
    state["finished_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def main():
    rows = int(os.environ.get("GS_ROWS", "4000000"))
    reps = int(os.environ.get("GS_REPS", "2"))
    out_path = os.environ.get("GS_OUT", os.path.join(REPO, "SCALING_r06.json"))
    sp = int(os.environ.get("GS_SP", "64"))
    leg_names = [
        s for s in os.environ.get(
            "GS_LEGS", "local8,local16,local32,lc1x8,lc4x8"
        ).split(",") if s
    ]

    state = {
        "metric": "graded_scaling_r6",
        "rows": rows,
        "reps": reps,
        "shuffle_partitions": sp,
        "note": (
            "round-6 code (fused verify, parquet-split barriers, capped "
            "cheap CC); round-robin leg order, min-of-reps; all reps "
            "published"
        ),
        "hardware": None,
        "runs": {k: [] for k in leg_names},
        "started_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }

    def flush():
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
        os.replace(tmp, out_path)

    # machine ceiling snapshot first (cheap, pure-numpy processes)
    state["hardware"] = {
        "8_vs_32": hardware_efficiency(8, 32),
        "8_vs_16": hardware_efficiency(8, 16),
        "16_vs_32": hardware_efficiency(16, 32),
    }
    if any(n in leg_names for n in ("local4", "lc1x4", "lc4x4")):
        state["hardware"]["4_vs_16"] = hardware_efficiency(4, 16)
    flush()

    for cycle in range(reps):
        for name in leg_names:
            master, _cores = ALL_LEGS[name]
            t0 = time.time()
            try:
                r = run_level(master, rows, sp)
            except Exception as e:  # noqa: BLE001 — record and keep going
                state.setdefault("failures", []).append({
                    "leg": name, "cycle": cycle, "error": str(e),
                    "utc": time.strftime(
                        "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                })
                flush()
                sys.stderr.write(f"cycle {cycle} {name}: FAILED ({e}); "
                                 "continuing with remaining legs\n")
                continue
            r["leg_wall_sec"] = round(time.time() - t0, 1)
            r["cycle"] = cycle
            r["utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
            state["runs"][name].append(r)
            flush()
            sys.stderr.write(f"cycle {cycle} {name}: {r['elapsed_sec']}s "
                             f"pairs={r['pairs']}\n")

    summarize(state)
    flush()
    # summarize() owns the best-of-reps dict (state["best_elapsed_sec"]);
    # referencing a local `best` here was a NameError after the refactor
    # that moved the summary block into summarize()
    print(json.dumps({
        "best": state["best_elapsed_sec"],
        "efficiency": state["efficiency"],
        "outputs_identical": state["outputs_identical"],
    }))


if __name__ == "__main__":
    main()
