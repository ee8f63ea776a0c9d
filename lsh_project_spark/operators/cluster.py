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


# below this edge count the component graph is driver-trivial: collect it,
# union-find in memory (ms), and skip the O(log^2 n)-round distributed loop
# whose per-round job latency would dominate.  5M edges ~= 80 MB collected;
# beyond that the large-star/small-star loop takes over (the 100 TB path).
DRIVER_CC_MAX_EDGES = 5_000_000


def numpy_components(ea: "np.ndarray", eb: "np.ndarray", n: int):
    """Vectorized min-label propagation with pointer jumping (the in-memory
    twin of Shiloach-Vishkin): labels[i] starts as i; each round pushes the
    min label across every edge at once (ufunc ``minimum.at``) then fully
    compresses by repeated composition ``labels[labels]``.  Min labels
    double their reach per round -> O(log n) rounds, each O(m) vectorized —
    replacing the round-3 per-edge Python loop (tens of seconds at the
    5M-edge ceiling) with ~100x-faster array passes.  At the fixpoint every
    node's label is its component's minimum index."""
    import numpy as np

    labels = np.arange(n, dtype=np.int64)
    while True:
        mn = np.minimum(labels[ea], labels[eb])
        new = labels.copy()
        np.minimum.at(new, ea, mn)
        np.minimum.at(new, eb, mn)
        while True:
            jumped = new[new]
            if np.array_equal(jumped, new):
                break
            new = jumped
        if np.array_equal(new, labels):
            return labels
        labels = new


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """One collect + vectorized numpy component labeling (see
    numpy_components)."""
    import numpy as np
    import pandas as pd

    pdf = edges.select("a", "b").toPandas()
    id_type = dict(edges.dtypes)["a"]
    if len(pdf) == 0:
        return edges.sparkSession.createDataFrame(
            [], schema=f"id {id_type}, cluster_id {id_type}"
        )
    uniq, inv = np.unique(
        pd.concat([pdf["a"], pdf["b"]]).to_numpy(), return_inverse=True
    )
    m = len(pdf)
    labels = numpy_components(inv[:m], inv[m:], len(uniq))
    # cluster_id = min node id per component: uniq is sorted ascending, so
    # the fixpoint label (min component index) indexes the min member
    out = pd.DataFrame({"id": uniq, "cluster_id": uniq[labels]})
    return edges.sparkSession.createDataFrame(
        out, schema=f"id {id_type}, cluster_id {id_type}"
    )


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(a, b))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, max_iter: int = 50,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """(a, b) undirected edge list -> (id, cluster_id) for every non-isolated
    node.  Union the full node set downstream if singletons matter.

    Graphs at or below ``driver_max_edges`` resolve with an in-memory
    union-find on the driver (one collect, milliseconds); larger graphs run
    the distributed large-star/small-star loop.  Pass 0 to force the
    distributed path."""
    # constraint propagation off while planning the iteration: edge lists
    # built from multi-branch unions over a shared subtree (candidate_pairs)
    # crash UnionBase.rewriteConstraints ("key not found: <attr>") when the
    # checkpoint plan is optimized; see session.py for the session-wide
    # default — this guard covers sessions not built by our factory
    spark = edges.sparkSession
    conf_key = "spark.sql.constraintPropagation.enabled"
    prev = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        return _connected_components_impl(edges, max_iter, driver_max_edges)
    finally:
        spark.conf.set(conf_key, prev)


def _connected_components_impl(
    edges: DataFrame, max_iter: int, driver_max_edges: int
) -> DataFrame:
    # Lineage cut per round (Catalyst cannot express iteration):
    # - with a checkpoint dir set (sc.setCheckpointDir), use RELIABLE
    #   checkpoints — survive executor loss, the right mode on a real
    #   cluster where localCheckpoint blocks are lost with their executor;
    # - otherwise executor-local checkpoints (sandbox/local mode).
    # Non-eager either way: the checksum aggregate both materializes the
    # round's checkpoint AND returns the convergence stats — one job/round.
    spark = edges.sparkSession
    reliable = spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()

    def _cut(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=False) if reliable else df.localCheckpoint(
            eager=False
        )

    cur = _cut(
        edges.select("a", "b")
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    prev_sum = _edge_checksum(cur)
    if prev_sum[0] <= driver_max_edges:
        return _driver_union_find(cur)
    for _ in range(max_iter):
        cur = _cut(_small_star(_large_star(cur)))
        cur_sum = _edge_checksum(cur)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # fixpoint is a star forest: edges are (child, root)
    children = cur.select(F.col("a").alias("id"), F.col("b").alias("cluster_id"))
    roots = cur.select(F.col("b").alias("id")).distinct().withColumn(
        "cluster_id", F.col("id")
    )
    result = children.unionByName(roots).dropDuplicates(["id"])
    # materialize (eager checkpoint) while the caller's constraint-propagation
    # guard is still in force: the union over the shared checkpointed subtree
    # must be OPTIMIZED with the conf off, not merely planned — otherwise the
    # UnionBase.rewriteConstraints crash the guard exists for fires at action
    # time in sessions that enable constraint propagation
    return result.checkpoint(eager=True) if reliable else result.localCheckpoint(
        eager=True
    )


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
