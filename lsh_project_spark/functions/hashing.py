"""Portable deterministic hashing.

The dedup pipeline's MinHash/SimHash stages must produce *bit-identical*
hashes in three places: the Spark job, the DuckDB SQL oracle (driver
correctness gate), and the Python/numpy test oracle.  Native hash functions
differ across engines (Spark xxhash64 vs DuckDB hash), so we define one
portable primitive, ``hash62``:

1. **Two polynomial (Rabin-Karp) lanes** over unicode codepoints:

       h1(s) = sum_j cp(s[j]) * B^(n-1-j)  mod M1     (Horner in-engine)
       h2(s) = same, mod M2

   with B = 1000003, M1 = 2^31 - 1 (Mersenne), M2 = 2147483629 (the
   largest prime below it).  Unlike the md5 family this replaces (see git
   history), polynomial lanes are *vectorizable*: numpy computes them as a
   padded codepoint-matrix multiply-accumulate with a per-row length
   correction (no per-string Python), which removes the interpreter from
   the pipeline's hottest stage.

2. **A two-round nonlinear finalizer** (polynomial hashes are additive —
   'img0' vs 'img2' differ by 2·B^0 per lane — so raw lane bits have NO
   avalanche, which would break every consumer that reads *bits*:
   SimHash votes, synthetic-phash Hamming fixtures):

       v  = (h1·h2 + A·h1 + B2·h2 + C)        mod M   (M = 2^61 - 1)
       lo = v mod 2^31,  hi = v >> 31
       hash62 = (lo·(2·hi + 1) + A2·hi + lo)  mod M

   The cross-lane product makes a small input delta produce a ~uniform
   output delta (delta ≈ h1·d2 + h2·d1 with h1, h2 uniform); the second
   round removes the residual linear tail.  Measured on the fixture
   population ('img0'..'imgN' + variants): min pairwise Hamming 13 (~binomial),
   vs 3 for raw lanes.  Every term stays below 2^62, so the arithmetic is
   exact signed-int64 in numpy, Spark BIGINT, and DuckDB BIGINT alike.

Downstream contract (same as the md5 family it replaced):

    h32       = hash62 % 2^32                        (MinHash base hash)
    h56       = hash62 >> 4                          (SimHash bit source;
                                                      only bits 0..55 are read)
    minhash_i = (a_i * h32 + b_i) mod p,   a_i,b_i < 2^31,  p = 2^61 - 1
    a_i*h32+b_i < 2^31 * 2^32 + 2^31 < 2^63          (no overflow anywhere)

This choice is ours (the reference's RNG/hashing is an internal PCG32 ±1
stream, /root/reference/src/lsh.c:18-42, which never hashes strings; its
hand-vectorized hash kernels, src/lsh.c:223-324, are the precedent for
keeping the hash family SIMD-friendly).  All three renderings are pinned
equal by tests/test_text_signatures.py and tests/test_profile_parity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

PORTABLE_HASH_MOD = (1 << 61) - 1  # Mersenne prime p (MinHash universal family)
H32 = 1 << 32

POLY_B = 1000003  # polynomial base (< 2^20)
POLY_M1 = (1 << 31) - 1  # Mersenne prime 2147483647
POLY_M2 = 2147483629  # largest prime below it

MIX_M = PORTABLE_HASH_MOD  # finalizer modulus 2^61 - 1
MIX_A = 1013904242  # round-1 constants, all < 2^30 (keeps products < 2^61)
MIX_B = 625538193
MIX_C = 656673429
MIX_A2 = 976686137  # round-2 constant

# strings per numpy batch are sub-chunked so the [rows, padded-width]
# temporaries stay bounded regardless of document length; the budget bounds
# rows * padded-width CELLS (np.array pads every row to the longest string)
_CHUNK_CHAR_BUDGET = 1 << 23  # ~8M cells -> 32 MB UCS4 + <=64 MB int64 blocks
# Horner column-block width: per-term products are < 2^21 * 2^31 = 2^52, so
# up to 1024 terms sum EXACTLY in int64 (< 2^62) with NO per-element modulo —
# int64 % has no SIMD path and would dominate (measured 25x slower)
_COL_BLOCK = 1024


def _mix_py(h1: int, h2: int) -> int:
    v = ((h1 * h2) % MIX_M + (MIX_A * h1) % MIX_M + (MIX_B * h2) % MIX_M + MIX_C) % MIX_M
    lo, hi = v % (1 << 31), v >> 31
    return ((lo * (2 * hi + 1)) % MIX_M + (MIX_A2 * hi) % MIX_M + lo) % MIX_M


def portable_hash62_py(s: str) -> int:
    """Scalar Python rendering (readable reference; tests only)."""
    h1 = h2 = 0
    for ch in s:
        c = ord(ch)
        h1 = (h1 * POLY_B + c) % POLY_M1
        h2 = (h2 * POLY_B + c) % POLY_M2
    return _mix_py(h1, h2)


def _pow_mod_vec(base: int, exps: np.ndarray, mod: int) -> np.ndarray:
    """base^exps mod mod, vectorized binary exponentiation (int64-safe:
    every product < mod^2 < 2^62)."""
    result = np.ones(len(exps), dtype=np.int64)
    b = base % mod
    e = exps.astype(np.int64).copy()
    while e.max(initial=0) > 0:
        result = np.where(e & 1 == 1, (result * b) % mod, result)
        b = (b * b) % mod
        e >>= 1
    return result


def _lane_hash(cp: np.ndarray, lens: np.ndarray, mod: int) -> np.ndarray:
    """One polynomial lane over a left-aligned, zero-padded codepoint matrix
    ``cp`` [n, L].  Trailing-zero padding inflates each row's exponents by
    B^(L - len); one vectorized modular-inverse correction removes it, so the
    result equals the per-string Horner exactly.  Column-blocked so weight
    tables stay small for very long strings."""
    n, L = cp.shape
    acc = np.zeros(n, dtype=np.int64)
    for lo in range(0, L, _COL_BLOCK):
        blk = cp[:, lo : lo + _COL_BLOCK]
        bw = blk.shape[1]
        w = np.array([pow(POLY_B, bw - 1 - j, mod) for j in range(bw)], dtype=np.int64)
        # blk*w < 2^52 per term, bw <= 1024 terms -> the int64 sum is exact;
        # ONE modulo per (row, block) instead of per element (see _COL_BLOCK)
        part = (blk * w[None, :]).sum(axis=1) % mod
        acc = (acc * pow(POLY_B, bw, mod) + part) % mod
    binv = pow(POLY_B, -1, mod)
    return (acc * _pow_mod_vec(binv, L - lens, mod)) % mod


def _mix_np(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    v = ((h1 * h2) % MIX_M + (MIX_A * h1) % MIX_M + (MIX_B * h2) % MIX_M + MIX_C) % MIX_M
    lo, hi = v % (1 << 31), v >> 31
    return ((lo * (2 * hi + 1)) % MIX_M + (MIX_A2 * hi) % MIX_M + lo) % MIX_M


# appended to every string before the fixed-width array is built: numpy's
# UCS4 buffer cannot distinguish trailing U+0000 from padding ('a\x00'
# round-trips as 'a'), so trailing-NUL strings would silently hash as their
# stripped twin.  A non-NUL final char makes both the buffer and
# np.char.str_len exact; its known contribution (last char, codepoint 1)
# is divided back out of each lane: h = (h' - 1) * B^-1 mod M.
_SENTINEL = "\x01"


def portable_hash62_np(strs, return_lanes: bool = False):
    """Vectorized numpy rendering: sequence of strings -> int64 hash62 array.

    np.array(dtype=str) gives a fixed-width UCS4 buffer; viewing it as
    uint32 yields the codepoint matrix with NO per-string Python work.
    Two guards keep this exact and bounded:

    - a sentinel char is appended per string (see ``_SENTINEL``) so trailing
      U+0000 survives the fixed-width buffer; each lane divides the
      sentinel's contribution back out, which is exact modular arithmetic;
    - chunks close when rows * padded-width would exceed the budget (the
      matrix is padded to the LONGEST row, so bounding the summed character
      count alone would let one multi-megabyte outlier among millions of
      short shingles blow the [rows, width] allocation).

    ``return_lanes=True`` additionally returns the raw polynomial lanes
    (h1, h2) so callers can derive PREFIXED hashes via lane composition
    (see :func:`salted_hash62_np`) without re-hashing the characters.
    """
    strs = list(strs)
    out = np.empty(len(strs), dtype=np.int64)
    l1 = np.empty(len(strs), dtype=np.int64) if return_lanes else None
    l2 = np.empty(len(strs), dtype=np.int64) if return_lanes else None
    inv1 = pow(POLY_B, -1, POLY_M1)
    inv2 = pow(POLY_B, -1, POLY_M2)
    pos = 0
    while pos < len(strs):
        end, max_w = pos, 1
        while end < len(strs):
            w = max(len(strs[end]) + 1, max_w)  # +1 = the sentinel column
            if end > pos and (end - pos + 1) * w > _CHUNK_CHAR_BUDGET:
                break
            max_w = w
            end += 1
        arr = np.array([s + _SENTINEL for s in strs[pos:end]], dtype=str)
        width = arr.itemsize // 4
        # zero-copy reinterpret of the UCS4 buffer; uint32 * int64
        # weights upcast to int64 in the lane multiply (no astype pass)
        cp = arr.view(np.uint32).reshape(end - pos, width)
        lens = np.char.str_len(arr).astype(np.int64)
        # strip the sentinel: (h' - 1) in [-1, M-1], * inv < 2^31 stays
        # within int64; numpy % with a positive modulus is non-negative
        h1 = ((_lane_hash(cp, lens, POLY_M1) - 1) * inv1) % POLY_M1
        h2 = ((_lane_hash(cp, lens, POLY_M2) - 1) * inv2) % POLY_M2
        out[pos:end] = _mix_np(h1, h2)
        if return_lanes:
            l1[pos:end] = h1
            l2[pos:end] = h2
        pos = end
    if return_lanes:
        return out, l1, l2
    return out


def salted_hash62_np(
    salt: str, h1: np.ndarray, h2: np.ndarray, lens: np.ndarray
) -> np.ndarray:
    """hash62(salt + s) from the polynomial lanes of s — NO re-hash of the
    characters.  Polynomial lanes compose exactly:

        lane(salt + s) = lane(salt) * B^len(s) + lane(s)   (mod M)

    Every term stays < 2^62 (lane(salt) < 2^31, B^len mod M < 2^31, sum
    adds < 2^31), so the arithmetic is exact int64 — bit-identical to
    hashing the concatenated string (pinned by tests/test_hashing.py)."""
    s1 = s2 = 0
    for ch in salt:
        c = ord(ch)
        s1 = (s1 * POLY_B + c) % POLY_M1
        s2 = (s2 * POLY_B + c) % POLY_M2
    lens = np.asarray(lens, dtype=np.int64)
    p1 = _pow_mod_vec(POLY_B, lens, POLY_M1)
    p2 = _pow_mod_vec(POLY_B, lens, POLY_M2)
    return _mix_np((s1 * p1 + h1) % POLY_M1, (s2 * p2 + h2) % POLY_M2)


def _mix_sql(h1: str, h2: str, shr31) -> str:
    """Finalizer as SQL arithmetic over lane expressions.  ``shr31(expr)``
    renders the 31-bit right shift per engine (Spark's `>>` operator does
    not parse inside HOF lambda bodies; shiftright() does).  Lane/round-1
    expressions are textually duplicated — scalar arithmetic, negligible."""
    v = (
        f"((({h1}) * ({h2})) % {MIX_M} + ({MIX_A} * ({h1})) % {MIX_M} "
        f"+ ({MIX_B} * ({h2})) % {MIX_M} + {MIX_C}) % {MIX_M}"
    )
    lo = f"(({v}) % 2147483648)"
    hi = shr31(v)
    return (
        f"((({lo}) * (2 * ({hi}) + 1)) % {MIX_M} "
        f"+ ({MIX_A2} * ({hi})) % {MIX_M} + ({lo})) % {MIX_M}"
    )


def spark_hash62(col_expr: str) -> str:
    """Spark SQL rendering of hash62 over a string expression: ONE pass over
    split(s, '') (codepoint-wise in Spark 4) with a struct accumulator for
    both lanes, finalizer in the aggregate's finish lambda.

    NOTE: HOF lambdas evaluate interpreted (outside codegen) — fine for
    low-volume columns (fixtures, per-doc hashes at test SF).  Hot paths
    (per-shingle hashing) use hash62_pandas_udf instead: same bits,
    Arrow-vectorized."""
    step = (
        f"(acc, c) -> named_struct("
        f"'h1', (acc.h1 * {POLY_B} + ascii(c)) % {POLY_M1}, "
        f"'h2', (acc.h2 * {POLY_B} + ascii(c)) % {POLY_M2})"
    )
    finish = "acc -> " + _mix_sql(
        "acc.h1", "acc.h2", lambda v: f"shiftright({v}, 31)"
    )
    return (
        f"aggregate(split({col_expr}, ''), "
        f"named_struct('h1', cast(0 as bigint), 'h2', cast(0 as bigint)), "
        f"{step}, {finish})"
    )


def duckdb_hash62(col_expr: str) -> str:
    """DuckDB SQL rendering of hash62 over a string expression.  list_filter
    drops the [''] that string_split yields for the empty string (whose
    unicode() is -1), making '' hash identically (lanes 0) in every engine.
    Lane expressions are textually duplicated into the finalizer; DuckDB's
    common-subexpression elimination keeps evaluation near-single-pass, and
    the oracle runs at test SF only."""

    def lane(mod: int) -> str:
        chars = f"list_filter(string_split({col_expr}, ''), c -> c <> '')"
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
            f"list_transform({chars}, c -> CAST(unicode(c) AS BIGINT))), "
            f"(acc, c) -> (acc * {POLY_B} + c) % {mod})"
        )

    return "(" + _mix_sql(lane(POLY_M1), lane(POLY_M2), lambda v: f"(({v}) >> 31)") + ")"


def hash62_pandas_udf():
    """Arrow-vectorized Spark rendering: string column -> int64 hash62.
    The hot-path twin of spark_hash62 (bit-identical; pinned by tests)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def h62(s: pd.Series) -> pd.Series:
        return pd.Series(portable_hash62_np(s.fillna("").tolist()))

    return h62


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


def minhash_apply_py(h62: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """numpy rendering: hash62 [n] x (a,b) [P] -> [n, P] minhash values
    (before the per-document min)."""
    h32 = (np.asarray(h62, dtype=np.int64) % H32)[:, None]
    return (a[None, :] * h32 + b[None, :]) % PORTABLE_HASH_MOD
