"""Portable deterministic hashing.

The dedup pipeline's MinHash/SimHash stages must produce *bit-identical*
hashes in three places: the Spark job (JVM expressions), the DuckDB SQL
oracle (driver correctness gate), and the Python/numpy test oracle.  Native
hash functions differ across engines (Spark xxhash64 vs DuckDB hash), so we
define one portable primitive:

    hash60(s) = int(md5(s).hexdigest()[:15], 16)        # 60 bits, signed-safe

md5 exists and agrees byte-for-byte in all three engines.  60 bits keeps
every downstream arithmetic step inside signed int64:

    h32       = hash60 % 2^32
    minhash_i = (a_i * h32 + b_i) mod p,   a_i,b_i < 2^31,  p = 2^61 - 1
    a_i*h32+b_i < 2^31 * 2^32 + 2^31 < 2^63   (no overflow anywhere)

This choice is ours (the reference's RNG/hashing is an internal PCG32 ±1
stream, /root/reference/src/lsh.c:18-42, which never hashes strings).
"""

from __future__ import annotations

import hashlib

import numpy as np

PORTABLE_HASH_MOD = (1 << 61) - 1  # Mersenne prime p
H32 = 1 << 32


def portable_hash60_py(s: str) -> int:
    """Python rendering of hash60 (test oracle)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def spark_hash60(col_expr: str) -> str:
    """Spark SQL rendering of hash60 over a string expression."""
    return f"cast(conv(substring(md5({col_expr}), 1, 15), 16, 10) as bigint)"


def duckdb_hash60(col_expr: str) -> str:
    """DuckDB SQL rendering of hash60 over a string expression."""
    return f"cast(('0x' || substring(md5({col_expr}), 1, 15)) as bigint)"


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(a, b, c) coefficient arrays for the universal-hash MinHash family and
    the order-independent band combiner; all < 2^31, a and c odd/nonzero.

    Drawn from PCG64(seed) so Spark job, SQL oracle (as literals), and the
    Python oracle share the exact same family.
    """
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.int64) | 1
    b = rng.integers(0, 1 << 31, size=num_perm, dtype=np.int64)
    c = rng.integers(1, 1 << 31, size=num_perm, dtype=np.int64) | 1
    return a, b, c


def minhash_apply_py(h60: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """numpy rendering: h60 [n] x (a,b) [P] -> [n, P] minhash values
    (before the per-document min)."""
    h32 = (np.asarray(h60, dtype=np.int64) % H32)[:, None]
    return (a[None, :] * h32 + b[None, :]) % PORTABLE_HASH_MOD
