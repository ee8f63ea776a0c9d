"""SimHash test oracle (Charikar '02).  No reference analog (SURVEY.md §2.9).

56-bit fingerprint (14 md5 hex chars) so every bit test stays in signed
int64 and renders identically in Spark SQL and DuckDB: bit b of the
fingerprint is 1 iff  sum over tokens of (2*bit_b(hash56(token)) - 1) > 0.
Ties (sum == 0) resolve to bit 0.
"""

from __future__ import annotations

import hashlib

import numpy as np

SIMHASH_BITS = 56


def hash56_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:14], 16)


def simhash64(text: str, num_bits: int = SIMHASH_BITS) -> int:
    """Token-level SimHash fingerprint (duplicate tokens count with
    multiplicity, matching the SQL rendering which sums over all tokens)."""
    toks = text.split(" ")
    votes = np.zeros(num_bits, dtype=np.int64)
    for t in toks:
        h = hash56_py(t)
        for b in range(num_bits):
            votes[b] += 1 if (h >> b) & 1 else -1
    fp = 0
    for b in range(num_bits):
        if votes[b] > 0:
            fp |= 1 << b
    return fp


def hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
