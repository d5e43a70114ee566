"""J7 — connected components by iterative joins (SURVEY.md §2.3 J7).

GraphFrames is not installed (SURVEY.md §7.3) and BASELINE.json:L6
explicitly allows "GraphFrames/iterative-join connected components", so
this is the iterative-join form: alternating large-star / small-star
steps (Kiveris et al., "Connected Components in MapReduce and Beyond") —
converges in O(log n) rounds on star-shaped skew, vs O(diameter) for
naive label propagation.

Each round shuffles on node id; lineage is cut with localCheckpoint per
iteration so the plan doesn't grow (SURVEY.md §7.4.2). Determinism: the
component id is the component's minimum node id — content-derived,
independent of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected edge list as (src>dst) pairs, no self-loops, distinct."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than the minimum neighbor to it."""
    nbrs = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = nbrs.groupBy("src").agg(F.min("dst").alias("mn"))
    return (
        nbrs.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(
            F.col("dst").alias("src"),
            F.least("mn", F.col("src")).alias("dst"),
        )
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Point all smaller neighbors of each node at its minimum neighbor."""
    e = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = e.groupBy("src").agg(F.min("dst").alias("mn"))
    return (
        e.join(m, "src")
        .select(
            F.when(F.col("dst") == F.col("mn"), F.col("src"))
            .otherwise(F.col("dst"))
            .alias("src"),
            F.col("mn").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .unionByName(m.select(F.col("src"), F.col("mn").alias("dst")))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """edges(src, dst) -> (node, component) with component = min node id.

    Isolated nodes (absent from edges) are the caller's concern — union
    them afterwards with component = their own id.
    """
    e = _canonical_edges(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ).localCheckpoint()
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        # converged when the edge set is stable (both frames are
        # (node -> smaller node) maps after a small-star step)
        changed = e2.exceptAll(e).limit(1).count() + e.exceptAll(e2).limit(1).count()
        e = e2
        if changed == 0:
            break
    # e now maps every non-root node to its component minimum
    nodes = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = (
        e.select(F.col("dst").alias("node"))
        .distinct()
        .join(e.select(F.col("src").alias("node")).distinct(), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return nodes.unionByName(roots)
