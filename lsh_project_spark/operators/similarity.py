"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — the reference's ground-truth
  linear scan (/root/reference/src/main.cc:91-113) as a DataFrame plan
  (crossJoin + window); the correctness baseline for ANN.
- ``hyperplane_signatures``: sign-LSH over embeddings using the engine's
  structured-rotation machinery — the rotated vector's coordinate signs
  give num_planes bits per table (same folded Hadamard rotations as the
  CP path, /root/reference/src/lsh.c:110-176), batched numpy per Arrow
  record batch.
- ``ann_topk_lsh``: bucket-join ANN — candidates from shared sign-bucket
  across L tables, exact cosine re-rank, top-k.  The scale path: candidate
  generation is an equi-join, never a cross join.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..config import CrossPolytopeConfig
from ..params import fold_rotations


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of each query against all vectors (excluding
    self-matches by id)."""
    dot = (
        f"aggregate(zip_with(qv, {vec_col}, (x, y) -> cast(x as double) * "
        f"cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"
    )
    nq = (
        "sqrt(aggregate(transform(qv, x -> cast(x as double) * cast(x as double)), "
        "cast(0 as double), (acc, v) -> acc + v))"
    )
    nd = (
        f"sqrt(aggregate(transform({vec_col}, x -> cast(x as double) * "
        f"cast(x as double)), cast(0 as double), (acc, v) -> acc + v))"
    )
    q = queries.select(F.col(qid_col), F.col(vec_col).alias("qv"))
    scored = (
        q.crossJoin(vectors.select(id_col, vec_col))
        .filter(F.col(id_col) != F.col(qid_col))
        .select(
            qid_col,
            F.col(id_col).alias("neighbor_id"),
            F.expr(f"({dot}) / (({nq}) * ({nd}))").alias("cos"),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", "neighbor_id", F.expr("round(cos, 6)").alias("cos"))
    )


def hyperplane_signatures(
    vectors: DataFrame, dim: int, num_tables: int = 8, bits: int = 16,
    seed: int = 7349, id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH buckets: (id, table_idx, bucket).  bits coordinate signs of
    the structured-rotated vector per table, packed into an int bucket."""
    cfg = CrossPolytopeConfig(
        dim=dim, k=1, num_tables=num_tables, num_rotations=3, seed=seed
    )
    rot = fold_rotations(cfg)[:, 0]  # [L, d, d]
    L = num_tables
    rot2d = np.ascontiguousarray(rot.transpose(2, 0, 1).reshape(dim, L * dim))
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float32)
            y = (x @ rot2d).reshape(len(pdf), L, dim)[:, :, :bits]
            buckets = ((y > 0).astype(np.int64) * weights[None, None, :]).sum(axis=2)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), L),
                    "table_idx": np.tile(np.arange(L, dtype=np.int32), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    id_type = dict(vectors.dtypes)[id_col]
    return vectors.select(id_col, vec_col).mapInPandas(
        sign, schema=f"{id_col} {id_type}, table_idx int, bucket long"
    )


def ann_topk_lsh(
    vectors: DataFrame, queries: DataFrame, dim: int, k: int = 5,
    num_tables: int = 8, bits: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding", qid_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: sign-LSH candidates -> exact cosine re-rank.

    At scale this replaces the O(Q*N) cross join with an equi-join whose
    cost tracks true near-neighbor density."""
    vsig = hyperplane_signatures(
        vectors, dim, num_tables, bits, id_col=id_col, vec_col=vec_col
    )
    qsig = hyperplane_signatures(
        queries.withColumnRenamed(qid_col, id_col), dim, num_tables, bits,
        id_col=id_col, vec_col=vec_col,
    ).withColumnRenamed(id_col, qid_col)
    cands = (
        qsig.join(vsig, ["table_idx", "bucket"])
        .filter(F.col(qid_col) != F.col(id_col))
        .select(qid_col, id_col)
        .dropDuplicates([qid_col, id_col])
    )
    q = queries.select(qid_col, F.col(vec_col).alias("qv"))
    joined = cands.join(q, qid_col).join(
        vectors.select(id_col, vec_col), id_col
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.vstack(pdf["qv"].to_numpy()).astype(np.float64)
            b = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            num = np.einsum("bd,bd->b", a, b)
            den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
            out = pdf[[qid_col, id_col]].copy()
            out["cos"] = np.where(den > 0, num / np.maximum(den, 1e-30), 0.0)
            yield out

    qid_type = dict(queries.dtypes)[qid_col]
    id_type = dict(vectors.dtypes)[id_col]
    scored = joined.mapInPandas(
        score, schema=f"{qid_col} {qid_type}, {id_col} {id_type}, cos double"
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", F.col(id_col).alias("neighbor_id"),
                F.expr("round(cos, 6)").alias("cos"))
    )
