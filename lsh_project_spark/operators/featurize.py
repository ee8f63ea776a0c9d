"""Featurization: image rows -> float32 feature vectors.

The analog of the reference's data model (unit float vectors,
/root/reference/src/main.cc:61-74).  Two paths:

- ``features_from_phash``: pure column math — unpack the precomputed 64-bit
  perceptual hash into a ±1/8 unit vector.  100% JVM-free numpy over Arrow
  batches; `bytes` is never touched (column pruning keeps it out of every
  shuffle, SURVEY.md §4).
- ``features_from_pixels``: decode `bytes` with the built-in codecs, gray ->
  32x32 -> DCT -> top 8x8 coefficient vector, L2-normalized.  The decode is
  the expensive path; it runs in ``mapInPandas`` with modest Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources.codecs import _dct_matrix, area_resize, decode_image, gray, phash_to_vector

FEATURES_SCHEMA = "image_id string, features array<float>"


def features_from_phash(images: DataFrame) -> DataFrame:
    """(image_id, phash) -> (image_id, features[64]); vectorized bit unpack."""

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = phash_to_vector(pdf["phash"].to_numpy())
            yield pd.DataFrame(
                {"image_id": pdf["image_id"], "features": list(vecs)}
            )

    return images.select("image_id", "phash").mapInPandas(
        unpack, schema=FEATURES_SCHEMA
    )


def features_from_pixels(images: DataFrame, out_dim: int = 64) -> DataFrame:
    """(image_id, bytes, fmt) -> normalized DCT-coefficient features.

    Heavier: decodes every image.  Select only the needed columns so the
    scan prunes the rest.
    """
    d32 = _dct_matrix(32)

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                g = area_resize(gray(decode_image(bytes(data), fmt)), 32)
                coeff = (d32 @ g @ d32.T)[:8, :8].flatten()
                coeff[0] = 0.0  # drop DC (brightness) term
                n = np.linalg.norm(coeff)
                feats.append((coeff / n if n else coeff).astype(np.float32))
            yield pd.DataFrame({"image_id": pdf["image_id"], "features": feats})

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        featurize, schema=FEATURES_SCHEMA
    )
