"""Pipeline metrics — the engine's rendering of the reference's occupancy
stats (table_entries_used / table_buckets_used, /root/reference/src/lsh.c:
898-914) and the FALCONN experiment stats (avg candidates, time split,
/root/reference/falconn/random_benchmark.cc:104-163).

Everything is computed as DataFrame aggregates (one job per call) and
returned as plain dicts so callers can JSON-dump them next to manifests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def bucket_occupancy(
    signatures: DataFrame, bucket_cols: tuple[str, ...] = ("modality", "band", "bucket")
) -> dict:
    """Per-modality bucket stats: buckets, max/avg size, rows in shared
    buckets (the candidate-pair mass)."""
    bc = list(bucket_cols)
    group = bc[0] if len(bc) > 1 else F.lit(0).alias("all")
    counts = signatures.groupBy(*bc).agg(F.count("*").alias("n"))
    rows = (
        counts.groupBy(group)
        .agg(
            F.count("*").alias("buckets"),
            F.max("n").alias("max_bucket"),
            F.expr("round(avg(n), 3)").alias("avg_bucket"),
            F.sum(F.expr("case when n >= 2 then n else 0 end")).alias(
                "rows_in_shared_buckets"
            ),
            F.sum(F.expr("case when n >= 2 then n * (n - 1) / 2 else 0 end")).alias(
                "raw_pair_mass"
            ),
        )
        .collect()
    )
    return {str(r[0]): {k: r[k] for k in r.asDict() if k != bc[0]} for r in rows}


def pair_stats(cands: DataFrame, verified: DataFrame) -> dict:
    """Candidate vs verified counts -> verification selectivity (the analog
    of FALCONN's avg candidates-per-query vs answers)."""
    n_cand = cands.count()
    n_ver = verified.count()
    return {
        "candidate_pairs": n_cand,
        "verified_pairs": n_ver,
        "verify_selectivity": round(n_ver / n_cand, 6) if n_cand else None,
    }


def cluster_stats(assignments: DataFrame) -> dict:
    """Cluster-size distribution of the final output."""
    sizes = assignments.groupBy("cluster_id").agg(F.count("*").alias("n"))
    row = sizes.agg(
        F.count("*").alias("clusters"),
        F.max("n").alias("max_cluster"),
        F.expr("round(avg(n), 4)").alias("avg_cluster"),
        F.sum(F.expr("case when n >= 2 then 1 else 0 end")).alias("dup_groups"),
        F.sum(F.expr("case when n >= 2 then n else 0 end")).alias("rows_in_dup_groups"),
    ).collect()[0]
    return dict(row.asDict())
