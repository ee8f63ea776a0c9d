"""Context packing for training-data assembly: concatenate the corpus in a
canonical order and chunk it into fixed-size context windows (the
GPT-style pack-then-split), emitting for every document the chunk range
it lands in.

The result is pure prefix-sum arithmetic — chunk boundaries are
``floor(cumulative_tokens / ctx_len)`` — so the assignment is a function
of (corpus, order), independent of partitioning, and a SQL oracle
reproduces it exactly (``sum() OVER (ORDER BY doc_id)``).

Scale: a naive ``Window.orderBy(doc_id)`` with no partition key plans as
ONE task holding the whole corpus.  This operator instead runs the
classic distributed prefix scan: range-repartition by doc_id, cumsum
inside each partition (ordinary partitioned window), then add each
partition's driver-collected base offset (P small numbers, not data).
The output is identical for any partition count — the sampled range
boundaries move work between tasks, never numbers between documents.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def pack_documents(
    docs: DataFrame,
    ctx_len: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, first_chunk, last_chunk): the inclusive range of
    ctx_len-token chunks document ``id`` occupies after whitespace-token
    concatenation in ascending ``id_col`` order."""
    toks = docs.select(
        F.col(id_col),
        F.expr(f"size(split({text_col}, ' '))").cast("long").alias(
            "n_tokens"),
    )
    P = num_partitions or toks.sparkSession.sparkContext.defaultParallelism
    # freeze the sampled range boundaries across the two jobs: the totals
    # job and the final pass must see the SAME binning (range repartition
    # samples boundaries at execution time, so a recompute could bin rows
    # into different _pids than the offsets were collected for).  An EAGER
    # localCheckpoint materializes once and — unlike persist(), which pins
    # an entry in the session cache manager until an explicit unpersist
    # (the round-5 leak: every call accumulated cached partitions for the
    # session lifetime) — its blocks are reclaimed by the ContextCleaner
    # as soon as the caller drops the returned DataFrame.
    parts = (
        toks.repartitionByRange(P, id_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # driver-side: P partial sums -> exclusive base offset per partition
    totals = {
        r["_pid"]: r["s"]
        for r in parts.groupBy("_pid").agg(
            F.sum("n_tokens").alias("s")).collect()
    }
    base, offsets = 0, {}
    for pid in sorted(totals):
        offsets[pid] = base
        base += totals[pid]
    off_expr = "CASE " + " ".join(
        f"WHEN _pid = {pid} THEN {off}L" for pid, off in offsets.items()
    ) + " ELSE 0L END"
    w = Window.partitionBy("_pid").orderBy(id_col)
    return (
        parts.withColumn(
            "end_sum", F.sum("n_tokens").over(w) + F.expr(off_expr)
        )
        .select(
            id_col,
            "n_tokens",
            F.floor((F.col("end_sum") - F.col("n_tokens"))
                    / ctx_len).alias("first_chunk"),
            F.floor((F.col("end_sum") - 1) / ctx_len).alias("last_chunk"),
        )
    )
