"""Shared numpy caption/document signature kernels.

One vectorized implementation of the shingle -> hash62 -> MinHash/SimHash
math, used by BOTH the fused Arrow profile stage (operators/profile.py)
and the standalone per-modality operators (operators/signatures.py).
Keeping a single kernel guarantees the standalone band tables and the
fused pipeline produce bit-identical signatures (pinned by
tests/test_profile_parity.py and the driver's DuckDB gates).

Why numpy and not JVM higher-order functions: Spark HOF lambdas evaluate
interpreted (outside whole-stage codegen); at num_perm x shingles x rows
element-ops they dominate the runtime (guide: eliminate the per-element
interpreted work, keep Spark for distribution).  The hash62 family is
already Arrow-vectorized (functions/hashing.py); these kernels keep the
minima/votes/band sums in the same numpy pass, so no per-shingle row ever
crosses an exchange: the per-doc signature comes out of the scan stage.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import pandas as pd

from .hashing import (
    PORTABLE_HASH_MOD,
    portable_hash62_np,
    salted_hash62_np,
)

H32 = 1 << 32
SIMHASH_BITS = 56


def shingle_set(text: str, k: int) -> list[str]:
    """Distinct word k-shingles; short docs yield one whole-text shingle
    (matches signatures.shingle_expr / oracle/minhash.shingles)."""
    toks = text.split(" ")
    if len(toks) <= k:
        return [text]
    return list({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})


class ShingleBlock(NamedTuple):
    """Per-block decomposition of a list of documents into hashed distinct
    shingles.  Doc i's shingle hashes are
    ``h62[inv[starts[i] : starts[i] + lengths[i]]]``.  ``lane1``/``lane2``
    are the raw polynomial lanes of each unique shingle and ``ulens`` its
    codepoint length, kept so prefixed hash families (SimHash's salted
    second fingerprint) derive by lane composition instead of a second
    character pass."""

    uniq: np.ndarray  # unique shingle strings (first-seen order)
    inv: np.ndarray  # flat occurrence -> unique index
    starts: np.ndarray  # per-doc segment starts into inv
    lengths: np.ndarray  # per-doc segment lengths
    h62: np.ndarray  # hash62 per unique shingle
    lane1: np.ndarray
    lane2: np.ndarray
    ulens: np.ndarray

    def salted_h62(self, salt: str) -> np.ndarray:
        return salted_hash62_np(salt, self.lane1, self.lane2, self.ulens)


def shingle_hash_block(texts: list[str], k: int) -> ShingleBlock:
    """Shared per-block decomposition: distinct shingles per doc, hashed
    ONCE per *unique* shingle in the block (small vocabularies repeat
    shingles heavily across docs).  Uniqueness comes from hash-based
    ``pd.factorize`` (first-seen order) — ~8x cheaper than the sorted
    ``np.unique`` it replaced, and every consumer gathers via ``inv``, so
    the order of ``uniq`` is immaterial."""
    sh_lists = [shingle_set(t, k) for t in texts]
    lengths = np.array([len(s) for s in sh_lists], dtype=np.int64)
    flat = np.array([s for lst in sh_lists for s in lst], dtype=object)
    inv, uniq = pd.factorize(flat)
    uniq = np.asarray(uniq, dtype=object)
    h62, lane1, lane2 = portable_hash62_np(uniq, return_lanes=True)
    ulens = np.fromiter((len(s) for s in uniq), dtype=np.int64, count=len(uniq))
    starts = np.zeros(len(texts), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    return ShingleBlock(
        uniq, np.asarray(inv, dtype=np.int64), starts, lengths, h62,
        lane1, lane2, ulens,
    )


def minhash_bands_from_block(
    h62_uniq: np.ndarray, inv: np.ndarray, starts: np.ndarray,
    a: np.ndarray, b: np.ndarray, c: np.ndarray, n_bands: int, rpb: int,
) -> np.ndarray:
    """[n_docs, n_bands] int64 band hashes.  Bit-identical to the SQL
    renderings: mh_i = min over shingle h32 of (a_i*h + b_i) mod P, band =
    exact int64 sum over the band's rows of ((mh_i mod 2^32) * c_i) mod P
    (rpb * P < 2^63, so the sum never overflows)."""
    P = PORTABLE_HASH_MOD
    h32u = h62_uniq % H32
    vals_u = (h32u[:, None] * a[None, :] + b[None, :]) % P  # [U, num_perm]
    sig = np.minimum.reduceat(vals_u[inv], starts, axis=0)  # [n, num_perm]
    terms = ((sig % H32) * c) % P
    return terms.reshape(len(starts), n_bands, rpb).sum(axis=2)


def simhash_from_block(
    h62s: np.ndarray, inv: np.ndarray, starts: np.ndarray
) -> np.ndarray:
    """[n_docs] int64 56-bit SimHash fingerprints from per-unique-shingle
    hash62 values (plain or salted family): bit b = 1 iff the +/-1 votes of
    the doc's shingles' h56 bit b sum positive."""
    h56u = h62s >> 4
    bits_u = (
        2 * ((h56u[:, None] >> np.arange(SIMHASH_BITS, dtype=np.int64)[None, :]) & 1) - 1
    ).astype(np.int8)  # [U, 56]
    votes = np.add.reduceat(bits_u[inv].astype(np.int32), starts, axis=0)
    weights = np.int64(1) << np.arange(SIMHASH_BITS, dtype=np.int64)
    return np.where(votes > 0, weights[None, :], 0).sum(axis=1)
