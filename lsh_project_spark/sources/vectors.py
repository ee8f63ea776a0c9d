"""Distributed vector/query/ground-truth generators — the reference's data
model verbatim (FIXTURES.md §2).

- ``random_unit_vectors``: n iid-N(0,1), L2-normalized float32 rows
  (semantics of createData, /root/reference/src/main.cc:61-74), generated
  with counter-based PCG64 keyed on row id — deterministic regardless of
  partitioning.
- ``noisy_queries``: q rows of ``0.95·data[pick] + 0.05·N(0,1)``, NOT
  re-normalized (createQueries, /root/reference/src/main.cc:76-88).
- ``brute_force_truth``: exact max-inner-product NN per query, first-max
  wins (findNearestNeighbours, /root/reference/src/main.cc:91-113) — a
  broadcast of the query block against a mapInPandas scan over the data,
  so ground truth scales to any n without a cross join.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _rng(seed: int, *key: int) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(list((seed,) + key)))


def random_unit_vectors(
    spark: SparkSession, n: int, dim: int, seed: int = 49628583,
    partitions: int | None = None,
) -> DataFrame:
    # enough splits to fill the cluster (Python workers are single-threaded
    # BLAS — see session.py), but at least ~1k rows per split so each Arrow
    # batch still amortizes into one big matmul
    parts = partitions or max(
        2, min(spark.sparkContext.defaultParallelism, n // 1024 or 2)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), dim), dtype=np.float32)
            for i, rid in enumerate(ids):
                v = _rng(seed, 0, int(rid)).normal(size=dim)
                out[i] = (v / np.linalg.norm(v)).astype(np.float32)
            yield pd.DataFrame({"id": ids, "features": list(out)})

    return spark.range(0, n, 1, parts).mapInPandas(
        gen, schema="id long, features array<float>"
    )


def noisy_queries(
    spark: SparkSession, data: DataFrame, num_queries: int, dim: int,
    n: int, seed: int = 49628583,
) -> DataFrame:
    """0.95*data[pick] + 0.05*N(0,1); pick keyed by qid."""
    picks = [(q, int(_rng(seed, 1, q).integers(0, n))) for q in range(num_queries)]
    pick_df = spark.createDataFrame(picks, "qid long, id long")
    joined = pick_df.join(data, "id").select("qid", "features")

    def noise(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            qids = pdf["qid"].to_numpy()
            base = np.vstack(pdf["features"].to_numpy()).astype(np.float32)
            out = np.empty_like(base)
            for i, q in enumerate(qids):
                g = _rng(seed, 2, int(q)).normal(size=base.shape[1])
                out[i] = 0.95 * base[i] + 0.05 * g.astype(np.float32)
            yield pd.DataFrame({"qid": qids, "features": list(out)})

    return joined.mapInPandas(noise, schema="qid long, features array<float>")


def brute_force_truth(queries: DataFrame, data: DataFrame) -> DataFrame:
    """(qid, nn_id): exact argmax inner product, first-max-wins.

    Queries are broadcast as a dense block; each data partition scores its
    rows against all queries (one BLAS matmul per Arrow batch) and emits
    its local argmax; a final groupBy takes the global max with the
    reference's first-index tie-break (min id at equal score)."""
    q_rows = queries.orderBy("qid").collect()
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    qmat = np.array([r["features"] for r in q_rows], dtype=np.float32)
    spark = data.sparkSession
    b_q = spark.sparkContext.broadcast((qids, qmat))

    def local_best(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lqids, lq = b_q.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            x = np.vstack(pdf["features"].to_numpy()).astype(np.float32)
            scores = lq @ x.T  # [Q, batch]
            best = np.argmax(scores, axis=1)
            yield pd.DataFrame(
                {
                    "qid": lqids,
                    "nn_id": ids[best],
                    "score": scores[np.arange(len(lqids)), best].astype(np.float64),
                }
            )

    partials = data.mapInPandas(
        local_best, schema="qid long, nn_id long, score double"
    )
    # global argmax: max score, ties -> smallest nn_id (first-max-wins in
    # data order == smallest row id for our generators)
    return (
        partials.groupBy("qid")
        .agg(F.expr("min_by(nn_id, struct(-score, nn_id))").alias("nn_id"))
    )


def planted_distance_queries(
    spark: SparkSession, data: DataFrame, num_queries: int, dim: int, n: int,
    r: float = 0.7071067811865476, seed: int = 119417657,
) -> DataFrame:
    """Queries planted at EXACT Euclidean distance ``r`` from a random data
    point (FALCONN benchmark generator,
    /root/reference/falconn/random_benchmark.cc:211-229):

        q = alpha * x + beta * dir_perp,   alpha = 1 - r^2/2,
        beta = sqrt(1 - alpha^2)

    with dir_perp a random unit vector orthogonalized against x.  For unit
    x this gives |q| = 1 and |q - x| = r exactly, so recall can be measured
    as a function of controlled distance.  Returns (qid, planted_id,
    features).
    """
    alpha = 1.0 - r * r / 2.0
    beta = float(np.sqrt(max(0.0, 1.0 - alpha * alpha)))
    picks = [(q, int(_rng(seed, 3, q).integers(0, n))) for q in range(num_queries)]
    pick_df = spark.createDataFrame(picks, "qid long, planted_id long")
    joined = pick_df.join(
        data.withColumnRenamed("id", "planted_id"), "planted_id"
    ).select("qid", "planted_id", "features")

    def plant(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            qids = pdf["qid"].to_numpy()
            base = np.vstack(pdf["features"].to_numpy()).astype(np.float64)
            out = np.empty_like(base, dtype=np.float32)
            for i, q in enumerate(qids):
                g = _rng(seed, 4, int(q)).normal(size=base.shape[1])
                g /= np.linalg.norm(g)
                g -= np.dot(g, base[i]) * base[i]
                g /= np.linalg.norm(g)
                out[i] = (alpha * base[i] + beta * g).astype(np.float32)
            yield pd.DataFrame(
                {"qid": qids, "planted_id": pdf["planted_id"], "features": list(out)}
            )

    return joined.mapInPandas(
        plant, schema="qid long, planted_id long, features array<float>"
    )
