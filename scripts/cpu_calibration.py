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
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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


def _burn_signature_kernel(q, seconds: float, kind: str):
    """Run the ACTUAL pipeline signature math — the pandas function inside
    make_minhash_udf / make_simhash_udf, via its .func attribute — outside
    Spark, in an isolated process. Separates the kernels' own core-scaling
    from everything Spark adds around them (Arrow pipe, Python worker
    scheduling, concurrent-branch interference): if K processes of this
    scale like the pure-numpy ceiling, the pipeline's signature-phase gap
    is Spark-side; if they don't, it is the kernels' own memory-bandwidth
    demand and belongs in the ceiling table."""
    import sys as _sys

    _sys.path.insert(0, REPO)
    import pandas as pd

    from ufo_dedup_spark.functions.hashing import (
        make_minhash_udf,
        make_simhash_udf,
    )

    fn = (
        make_minhash_udf(128, 3, 42).func
        if kind == "minhash"
        else make_simhash_udf(2, 42).func
    )
    rng = np.random.RandomState(7)
    words = [f"w{i}" for i in range(5000)]
    texts = pd.Series(
        [
            " ".join(words[j] for j in rng.randint(0, 5000, size=400))
            for _ in range(64)
        ]
    )
    fn(texts)  # warm (JIT-less, but allocators/caches settle)
    n = 0
    t_end = time.time() + seconds
    while time.time() < t_end:
        fn(texts)
        n += len(texts)
    q.put(n)


def _kernel_throughput(workers: int, seconds: float, kind: str) -> float:
    q = mp.Queue()
    ps = [
        mp.Process(target=_burn_signature_kernel, args=(q, seconds, kind))
        for _ in range(workers)
    ]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / seconds


def kernel_efficiency(
    low: int, high: int, seconds: float = 12.0, kind: str = "minhash"
) -> dict:
    t_low = _kernel_throughput(low, seconds, kind)
    t_high = _kernel_throughput(high, seconds, kind)
    eff = (t_high / t_low) / (high / low)
    return {
        "kernel": kind,
        "low_cores": low,
        "high_cores": high,
        "low_docs_per_sec": round(t_low, 1),
        "high_docs_per_sec": round(t_high, 1),
        "kernel_speedup": round(t_high / t_low, 3),
        "kernel_efficiency": round(eff, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--seconds", type=float, default=12.0)
    ap.add_argument(
        "--kernel", choices=["minhash", "simhash", "both"], default=None,
        help="also scale the real signature kernels (UDF inner math, "
             "no Spark) at the same worker counts")
    args = ap.parse_args()
    low, high = (int(x) for x in args.levels.split(","))
    out = {
        "metric": "hardware_cpu_scaling",
        **hardware_efficiency(low, high, args.seconds),
    }
    if args.kernel:
        kinds = (
            ["minhash", "simhash"] if args.kernel == "both" else [args.kernel]
        )
        out["kernels"] = [
            kernel_efficiency(low, high, args.seconds, k) for k in kinds
        ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
