"""Connected components over the verified-pair edge list.

No reference analog (the reference returns top-1 neighbors, not clusters);
mandated by the dedup graft.  Implements the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14) as a driver-side loop of DataFrame exchanges:

  large-star: symmetrize; per node u with neighbors N(u),
              m = min(N(u) ∪ {u}); emit (v, m) for v in N(u), v > u.
  small-star: direct each edge from larger to smaller endpoint; per node u
              with smaller-neighbors N-(u), m = min(N-(u) ∪ {u});
              emit (v, m) for v in N-(u) ∪ {u}, v != m.

Each phase is one groupBy-min + one join; ``localCheckpoint`` cuts lineage
every round (Catalyst cannot express iteration — SURVEY.md §4).  Converges
when the edge set reaches a fixpoint (a forest of depth-1 stars); expected
O(log^2 n) rounds.  cluster_id = min node id in the component.  Node ids
may be strings or longs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.select("a", "b").unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
    mins = mins.select("a", F.least("a", "mn").alias("m"))
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .dropDuplicates(["a", "b"])
    )


def _small_star(edges: DataFrame) -> DataFrame:
    directed = (
        edges.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    mins = directed.groupBy("a").agg(F.min("b").alias("mn"))
    mins = mins.select("a", F.least("a", "mn").alias("m"))
    return (
        directed.join(mins, "a")
        .select(F.col("b").alias("v"), "m")
        .unionByName(mins.select(F.col("a").alias("v"), "m"))
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .dropDuplicates(["a", "b"])
    )


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(a, b))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """(a, b) undirected edge list -> (id, cluster_id) for every non-isolated
    node.  Union the full node set downstream if singletons matter."""
    # non-eager checkpoints: the checksum aggregate both materializes the
    # round's checkpoint AND returns the convergence stats — one Spark job
    # per round instead of two
    cur = (
        edges.select("a", "b")
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=False)
    )
    prev_sum = _edge_checksum(cur)
    for _ in range(max_iter):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        cur_sum = _edge_checksum(cur)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # fixpoint is a star forest: edges are (child, root)
    children = cur.select(F.col("a").alias("id"), F.col("b").alias("cluster_id"))
    roots = cur.select(F.col("b").alias("id")).distinct().withColumn(
        "cluster_id", F.col("id")
    )
    return children.unionByName(roots).dropDuplicates(["id"])


def assign_clusters(
    all_ids: DataFrame, edges: DataFrame, id_col: str = "image_id"
) -> DataFrame:
    """Full assignment including singletons: (id_col, cluster_id)."""
    labels = connected_components(edges)
    return (
        all_ids.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("cluster_id", "id").alias("cluster_id"),
        )
    )
