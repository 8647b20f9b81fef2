"""Raw-hardware CPU scaling calibration (no Spark).

Scaling-efficiency numbers for the dedup pipeline must be read against
what the MACHINE itself gives N vs 4N busy cores: on shared/virtualized
hosts (this sandbox is a 32-vCPU Firecracker VM), memory bandwidth, turbo
behavior and host oversubscription mean 4x the busy cores yield LESS than
4x the arithmetic throughput even for embarrassingly parallel work with
zero coordination.

This script measures exactly that ceiling: K independent processes doing
pure numpy arithmetic (no shared state, no IPC during the timed window),
total iterations per wall-second at each K. The pipeline's parallel
efficiency divided by this hardware efficiency is the engine's
coordination efficiency — the number that is actually about the engine.

Usage: python scripts/cpu_calibration.py [--levels 8,32] [--seconds 12]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np


def _burn(q, seconds: float):
    x = np.random.RandomState(0).standard_normal(500)
    n = 0
    t_end = time.time() + seconds
    while time.time() < t_end:
        for _ in range(200):
            (x @ x, x.sum())
        n += 200
    q.put(n)


def throughput(workers: int, seconds: float) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_burn, args=(q, seconds)) for _ in range(workers)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / seconds


def hardware_efficiency(low: int, high: int, seconds: float = 12.0) -> dict:
    t_low = throughput(low, seconds)
    t_high = throughput(high, seconds)
    ratio = high / low
    eff = (t_high / t_low) / ratio
    return {
        "low_cores": low,
        "high_cores": high,
        "low_iters_per_sec": round(t_low),
        "high_iters_per_sec": round(t_high),
        "hardware_speedup": round(t_high / t_low, 3),
        "hardware_efficiency": round(eff, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--seconds", type=float, default=12.0)
    args = ap.parse_args()
    low, high = (int(x) for x in args.levels.split(","))
    print(json.dumps({
        "metric": "hardware_cpu_scaling",
        **hardware_efficiency(low, high, args.seconds),
    }))


if __name__ == "__main__":
    main()
