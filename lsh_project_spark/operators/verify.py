"""Exact verification of candidate pairs.

The reference verifies every probed candidate with an exact inner product
(negative_inner_product, /root/reference/src/lsh.c:851-877).  The dedup
graft's exact checks are:

- images:  Hamming distance on the 64-bit perceptual hash  (JVM-only:
  ``bit_count(pa ^ pb) <= tau`` — stays in whole-stage codegen),
- captions: exact shingle Jaccard (JVM-only: array_intersect/array_union
  over the shingle arrays),
- vectors:  exact cosine / inner product (batched numpy over Arrow, the
  literal analog of the reference kernel).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .signatures import shingle_expr


def verify_phash_hamming(
    pairs: DataFrame, images: DataFrame, threshold: int,
    id_col: str = "image_id", phash_col: str = "phash",
) -> DataFrame:
    """(a, b) pairs -> pairs with hamming(phash_a, phash_b) <= threshold.

    Joins only the (id, phash) projection — `bytes` never enters a shuffle.
    """
    ph = images.select(F.col(id_col).alias("_vid"), F.col(phash_col).alias("_vph"))
    return (
        pairs.join(ph.withColumnRenamed("_vid", "a").withColumnRenamed("_vph", "pa"), "a")
        .join(ph.withColumnRenamed("_vid", "b").withColumnRenamed("_vph", "pb"), "b")
        .filter(F.expr(f"bit_count(pa ^ pb) <= {threshold}"))
        .select("a", "b")
    )


def verify_jaccard(
    pairs: DataFrame, docs: DataFrame, shingle_size: int, threshold: float,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(a, b) pairs -> pairs with exact shingle-Jaccard >= threshold, JVM-only."""
    sh = docs.select(
        F.col(id_col).alias("_vid"), shingle_expr(text_col, shingle_size).alias("_sh")
    )
    return (
        pairs.join(sh.withColumnRenamed("_vid", "a").withColumnRenamed("_sh", "sa"), "a")
        .join(sh.withColumnRenamed("_vid", "b").withColumnRenamed("_sh", "sb"), "b")
        .withColumn(
            "jaccard",
            F.expr(
                "size(array_intersect(sa, sb)) / size(array_union(sa, sb))"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def verify_cosine(
    pairs: DataFrame, vectors: DataFrame, threshold: float,
    id_col: str = "id", vec_col: str = "features",
) -> DataFrame:
    """(a, b) pairs -> pairs with exact cosine >= threshold; batched numpy
    (the reference's exact inner-product verify, vectorized per Arrow batch)."""
    v = vectors.select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vec"))
    joined = (
        pairs.join(v.withColumnRenamed("_vid", "a").withColumnRenamed("_vec", "va"), "a")
        .join(v.withColumnRenamed("_vid", "b").withColumnRenamed("_vec", "vb"), "b")
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            va = np.vstack(pdf["va"].to_numpy()).astype(np.float64)
            vb = np.vstack(pdf["vb"].to_numpy()).astype(np.float64)
            num = np.einsum("bd,bd->b", va, vb)
            den = np.linalg.norm(va, axis=1) * np.linalg.norm(vb, axis=1)
            cos = np.where(den > 0, num / np.maximum(den, 1e-30), 0.0)
            out = pdf[["a", "b"]].copy()
            out["cosine"] = cos
            yield out[cos >= threshold]

    return joined.mapInPandas(score, schema="a string, b string, cosine double")
