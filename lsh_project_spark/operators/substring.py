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

_B = 1000003  # polynomial hash base (shared by both lanes)
# two coprime 31-bit prime moduli; the pair (h1, h2) packs into one 62-bit
# fingerprint.  31-bit lanes keep every numpy intermediate inside int64:
# byte * weight < 2^39, k-term dot < k * 2^62/k, see _gram_dot.
_M1 = (1 << 31) - 1  # Mersenne prime 2147483647
_M2 = 2147483629  # largest prime below it


def _gram_dot(win: np.ndarray, mod: int, k: int) -> np.ndarray:
    """Polynomial hash of each row of ``win`` ([n, k] uint8) mod ``mod``:
    h[i] = sum_j win[i, j] * B^(k-1-j) mod ``mod``.  One BLAS float64
    matvec then one mod: every product < 256 * 2^31 = 2^39 and the k-term
    sum < k * 2^39 < 2^53 for k <= 512, so the float64 arithmetic is
    EXACT (no rounding).  ``win`` must already be float64."""
    assert k <= 512, "k-gram too wide for exact float64 accumulation"
    w = np.array([pow(_B, k - 1 - j, mod) for j in range(k)], dtype=np.float64)
    return (win @ w).astype(np.int64) % mod


def _kgram_hashes(text: str, k: int) -> np.ndarray:
    """62-bit fingerprints of all char k-grams, fully vectorized numpy
    (sliding_window_view + one batched multiply-accumulate per 31-bit
    lane; no per-character Python).  Equal grams always hash equal, so
    the winnowing recall guarantee is hash-scheme independent; the 62-bit
    space only controls false-candidate rate before exact verify."""
    x = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = len(x)
    if n < k:
        return np.empty(0, dtype=np.int64)
    win = np.ascontiguousarray(
        np.lib.stride_tricks.sliding_window_view(x, k), dtype=np.float64
    )
    h1 = _gram_dot(win, _M1, k)
    h2 = _gram_dot(win, _M2, k)
    return h1 * _M2 + h2  # < 2^31 * 2^31 + 2^31 < 2^62


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
