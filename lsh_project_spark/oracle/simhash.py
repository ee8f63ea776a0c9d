"""SimHash test oracle (Charikar '02).  No reference analog (SURVEY.md §2.9).

56-bit fingerprint (hash62 >> 4; bits 0..55) so every bit test stays in
signed int64 and renders identically in Spark SQL and DuckDB: bit b of the
fingerprint is 1 iff  sum over distinct word-3-shingles of
(2*bit_b(hash56(shingle)) - 1) > 0.  Ties (sum == 0) resolve to bit 0.
Shingle features (vs raw tokens) keep fingerprints spread out under small
vocabularies.
"""

from __future__ import annotations

import numpy as np

from ..functions.hashing import portable_hash62_py

SIMHASH_BITS = 56

_H56_MASK = (1 << SIMHASH_BITS) - 1


def hash56_py(s: str) -> int:
    return (portable_hash62_py(s) >> 4) & _H56_MASK


def simhash64(
    text: str, num_bits: int = SIMHASH_BITS, shingle_k: int = 3, salt: str = ""
) -> int:
    """SimHash fingerprint over distinct word k-shingles.  ``salt`` selects
    an independent hash family (the engine's second fingerprint uses
    salt='s2:', operators/signatures.SIMHASH_SALT)."""
    from .minhash import shingles

    feats = shingles(text, shingle_k)
    votes = np.zeros(num_bits, dtype=np.int64)
    for t in feats:
        h = hash56_py(salt + t)
        for b in range(num_bits):
            votes[b] += 1 if (h >> b) & 1 else -1
    fp = 0
    for b in range(num_bits):
        if votes[b] > 0:
            fp |= 1 << b
    return fp


def hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
