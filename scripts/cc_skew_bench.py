"""Hot-key evidence for connected_components: a planted giant component
(one hub neighborhood of ``--members`` nodes — the shape a boilerplate
mega-cluster takes after the LSH star cap) timed on the window fast path
vs the threshold-gated two-phase-min skew path.

The window path must co-locate the hub's entire neighborhood in ONE task
per round; the skew path splits it across input partitions via map-side
partial aggregation. Outputs are asserted identical.

Usage: python scripts/cc_skew_bench.py [--members 500000] [--master local[32]]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from ufo_dedup_spark.operators.connected_components import (  # noqa: E402
    connected_components,
)
from ufo_dedup_spark.session import build_session  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=500_000)
    ap.add_argument("--master", default="local[32]")
    args = ap.parse_args()

    spark = build_session(app_name="cc-skew-bench", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")

    n = args.members
    # hub star (the hot neighborhood) + a 10% chord layer so later rounds
    # still carry edges, + scattered small components as background
    hub = spark.range(1, n).select(
        F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b")
    )
    chords = spark.range(1, n // 10).select(
        F.col("id").alias("id_a"),
        (F.col("id") * 7 % F.lit(n)).alias("id_b"),
    )
    small = spark.range(0, 50_000).select(
        (F.col("id") + F.lit(10_000_000)).alias("id_a"),
        (F.col("id") + F.lit(10_000_000) + (F.col("id") % 2)).alias("id_b"),
    )
    edges = hub.unionByName(chords).unionByName(small).localCheckpoint(
        eager=True
    )

    def timed(cutoff: int):
        t0 = time.time()
        out = connected_components(edges, skew_degree_cutoff=cutoff)
        row = out.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.xxhash64("id", "cluster_id").cast("decimal(38,0)")).alias(
                "h"
            ),
        ).collect()[0]
        return round(time.time() - t0, 2), (row["rows"], str(row["h"]))

    # warm (JVM/codegen), not timed
    connected_components(
        spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    ).count()

    fast_sec, fast_fp = timed(cutoff=1 << 62)  # never trips: window path
    skew_sec, skew_fp = timed(cutoff=100_000)  # default: hub trips it
    assert fast_fp == skew_fp, (fast_fp, skew_fp)

    print(
        json.dumps(
            {
                "metric": "cc_hotkey_window_vs_twophase",
                "members": n,
                "master": args.master,
                "window_path_sec": fast_sec,
                "skew_path_sec": skew_sec,
                "identical_outputs": True,
                "rows": fast_fp[0],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
