"""Distributed connected components: alternating large-star / small-star.

The clustering stage the reference explicitly lacks (its README stops short
of transitive closure). Implements the two-phase star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond") as a driver loop of
DataFrame jobs: converges in O(log n) rounds, each round two shuffles;
``localCheckpoint`` after every round truncates lineage so plans stay flat.

Output: (id, cluster_id) where cluster_id = min node id of the component.
Every node appearing in the edge list gets a row (isolated nodes of the
corpus simply never appear — callers union them back with cluster_id = id
if desired).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(uv: DataFrame) -> DataFrame:
    """Both directions of an (u, v) edge list, distinct."""
    return uv.unionByName(
        uv.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()


def _large_star(nbr: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    mins = nbr.groupBy("u").agg(F.min("v").alias("_mv"))
    mins = mins.select("u", F.least(F.col("u"), F.col("_mv")).alias("m"))
    return (
        nbr.join(mins, on="u", how="inner")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(nbr: DataFrame) -> DataFrame:
    """Connect every neighbor <= u (and u itself) to the minimum of that set."""
    le = nbr.filter(F.col("v") <= F.col("u"))
    mins = le.groupBy("u").agg(F.min("v").alias("_mv"))
    mins = mins.select("u", F.least(F.col("u"), F.col("_mv")).alias("m"))
    linked = (
        le.join(mins, on="u", how="inner")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_links = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        linked.unionByName(self_links)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """(id_a, id_b) edge list -> (id, cluster_id = component min id).

    Round materialization rides the convergence-check job: each round ends
    in a LAZY localCheckpoint — the logical plan truncates immediately
    (a star-op round references its input plan three times, so without
    truncation the plan tree grows exponentially with rounds), and the
    fingerprint aggregation is the first consumer, so ONE job both
    materializes the round and decides convergence — half the driver jobs
    of the eager-checkpoint formulation.
    """
    uv = edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))

    def _fingerprint(df: DataFrame) -> tuple:
        """Cheap one-job convergence fingerprint of a distinct edge set:
        (count, sum of xxhash64(u,v)). Collision-safe in practice and far
        cheaper than two exceptAll scans per round."""
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    nbr = _symmetrize(uv).localCheckpoint(eager=False)
    fp = _fingerprint(nbr)  # materializes nbr
    for _ in range(max_iter):
        after_large = _symmetrize(_large_star(nbr))
        after_small = _small_star(after_large)
        nbr = _symmetrize(after_small).localCheckpoint(eager=False)
        fp2 = _fingerprint(nbr)  # materializes this round
        if fp2 == fp:
            break
        fp = fp2

    # at convergence every edge points node -> component min
    comp = nbr.groupBy("u").agg(F.min("v").alias("cluster_id"))
    comp = comp.select(
        F.col("u").alias("id"),
        F.least(F.col("u"), F.col("cluster_id")).alias("cluster_id"),
    )
    roots = comp.select(F.col("cluster_id").alias("id")).distinct().withColumn(
        "cluster_id", F.col("id")
    )
    return (
        comp.unionByName(roots)
        .groupBy("id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
