"""MinHash-over-shingles test oracle (Broder '97).

No reference analog — mandated by the dedup graft (SURVEY.md §2.9).  Shares
the portable hash family with the Spark job and the DuckDB SQL oracle
(functions/hashing.py) so signatures agree bit-exactly.
"""

from __future__ import annotations

import numpy as np

from ..config import MinHashConfig
from ..functions.hashing import (
    PORTABLE_HASH_MOD,
    minhash_apply_py,
    minhash_params,
    portable_hash62_np,
)

H32 = 1 << 32


def shingles(text: str, k: int) -> set[str]:
    """Word k-shingles; documents shorter than k words yield the whole text."""
    toks = text.split(" ")
    if len(toks) <= k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def exact_jaccard(a: str, b: str, k: int) -> float:
    sa, sb = shingles(a, k), shingles(b, k)
    return len(sa & sb) / len(sa | sb)


def minhash_signature(text: str, cfg: MinHashConfig) -> np.ndarray:
    """int64 [num_perm] signature: min over shingles of (a*h32+b) mod p."""
    a, b, _ = minhash_params(cfg.num_perm, cfg.seed)
    sh = sorted(shingles(text, cfg.shingle_size))
    h62 = portable_hash62_np(sh)
    return minhash_apply_py(h62, a, b).min(axis=0)


def band_hashes(sig: np.ndarray, cfg: MinHashConfig) -> np.ndarray:
    """Order-independent band combiner (matches the SQL rendering):
    band_hash = sum over rows r in band of ((sig_r % 2^32) * c_r) % p."""
    _, _, c = minhash_params(cfg.num_perm, cfg.seed)
    r = cfg.rows_per_band
    out = np.empty(cfg.num_bands, dtype=np.int64)
    for band in range(cfg.num_bands):
        lo = band * r
        terms = ((sig[lo : lo + r] % H32) * c[lo : lo + r]) % PORTABLE_HASH_MOD
        out[band] = terms.sum()
    return out
