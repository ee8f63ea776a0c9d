"""Suffix-array substring-duplicate pass (Lee et al. '22 style; no
reference analog — mandated by the dedup graft, SURVEY.md §2.9).

Finds document pairs sharing an exact common substring of >= min_length
characters, at scale, in three stages:

1. **Winnowed fingerprints** (Schleimer et al. '03): per document, rolling
   polynomial hashes of char k-grams; keep the minimum hash of every
   window of w = min_length - k + 1 consecutive k-grams.  Guarantee: any
   common substring of length >= w + k - 1 = min_length shares at least
   one selected fingerprint.  Vectorized numpy inside ``mapInPandas``
   (sliding_window_view), shuffle-free.
2. **Candidate pairs**: fingerprint equi-join (same bucket-join pattern as
   every other modality; hot-fingerprint star defense applies).
3. **Exact verify**: per candidate pair, the true longest-common-substring
   length via a generalized *suffix array* + LCP on the concatenated pair
   (functions/suffix.py) — batched in a pandas UDF.

Cross-partition correctness is free: fingerprints are global values, the
equi-join sees all documents regardless of partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..config import SubstringConfig
from ..functions.suffix import longest_common_substring_len
from .candidates import candidate_pairs

_B = 1000003  # polynomial rolling-hash base
_M = (1 << 61) - 1


def _kgram_hashes(text: str, k: int) -> np.ndarray:
    """Rolling polynomial hashes of all char k-grams, vectorized."""
    x = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    n = len(x)
    if n < k:
        return np.empty(0, dtype=np.int64)
    # hash[i] = sum x[i+j] * B^(k-1-j) mod M, computed by rolling update
    powk = pow(_B, k - 1, _M)
    out = np.empty(n - k + 1, dtype=np.int64)
    h = 0
    for j in range(k):
        h = (h * _B + int(x[j])) % _M
    out[0] = h
    for i in range(1, n - k + 1):
        h = ((h - int(x[i - 1]) * powk) * _B + int(x[i + k - 1])) % _M
        out[i] = h % _M
    return out % _M


def winnowed_fingerprints(
    docs: DataFrame, cfg: SubstringConfig, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, text) -> (id, fp): distinct winnowed fingerprints per doc."""
    k, w = cfg.kgram, cfg.window

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                h = _kgram_hashes(text, k)
                if len(h) == 0:
                    continue
                if len(h) <= w:
                    sel = np.array([h.min()])
                else:
                    win = np.lib.stride_tricks.sliding_window_view(h, w)
                    sel = np.unique(win.min(axis=1))
                for fp in sel:
                    ids.append(i)
                    fps.append(int(fp))
            yield pd.DataFrame({id_col: ids, "fp": fps})

    out_schema = f"{id_col} {dict(docs.dtypes)[id_col]}, fp long"
    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def substring_pairs(
    docs: DataFrame, cfg: SubstringConfig, id_col: str = "doc_id",
    text_col: str = "text", hot_threshold: int = 64,
) -> DataFrame:
    """(id, text) -> (a, b, lcs_len) pairs with an exact common substring of
    >= cfg.min_length chars."""
    fps = winnowed_fingerprints(docs, cfg, id_col, text_col)
    cands = candidate_pairs(
        fps, id_col=id_col, bucket_cols=("fp",), hot_bucket_threshold=hot_threshold
    )
    side = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    joined = (
        cands.join(
            side.withColumnRenamed("_id", "a").withColumnRenamed("_t", "ta"), "a"
        ).join(
            side.withColumnRenamed("_id", "b").withColumnRenamed("_t", "tb"), "b"
        )
    )
    min_len = cfg.min_length
    a_type = dict(docs.dtypes)[id_col]

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            lens = [
                longest_common_substring_len(ta, tb)
                for ta, tb in zip(pdf["ta"], pdf["tb"])
            ]
            out = pdf[["a", "b"]].copy()
            out["lcs_len"] = np.array(lens, dtype=np.int64)
            yield out[out["lcs_len"] >= min_len]

    return joined.mapInPandas(
        verify, schema=f"a {a_type}, b {a_type}, lcs_len long"
    )
