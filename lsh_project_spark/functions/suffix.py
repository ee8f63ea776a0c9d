"""Suffix array + LCP (numpy, prefix doubling + Kasai) and exact longest
common substring.

Public algorithms: Manber-Myers prefix doubling (O(n log n) with numpy
argsort), Kasai et al. LCP construction, and the classic two-string LCS via
a generalized suffix array with a separator.  Used by the substring-
duplicate pass (operators/substring.py) as the exact verifier and the
within-partition candidate generator.
"""

from __future__ import annotations

import numpy as np


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an int array (values >= 0) by prefix doubling."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.asarray(s, dtype=np.int64)
    # compress initial alphabet
    order = np.argsort(rank, kind="stable")
    rank = _rerank(rank[order], order, n)
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        # sort by (rank[i], rank[i+k])
        order = np.lexsort((key2, rank))
        combined = rank[order] * (n + 1) + (key2[order] + 1)
        rank = _rerank(combined, order, n)
        if rank.max() == n - 1:
            break
        k *= 2
    sa = np.empty(n, dtype=np.int64)
    sa[rank] = np.arange(n)
    return sa


def _rerank(sorted_keys: np.ndarray, order: np.ndarray, n: int) -> np.ndarray:
    new = np.zeros(n, dtype=np.int64)
    new[1:] = np.cumsum(sorted_keys[1:] != sorted_keys[:-1])
    rank = np.empty(n, dtype=np.int64)
    rank[order] = new
    return rank


def lcp_array(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = longest common prefix of suffixes sa[i-1], sa[i]
    (lcp[0] = 0)."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring_len(a: str, b: str) -> int:
    """Exact LCS length via a generalized suffix array with a separator
    (the suffix-array substring-duplicate verify)."""
    if not a or not b:
        return 0
    xa = np.frombuffer(a.encode("utf-8"), dtype=np.uint8).astype(np.int64) + 2
    xb = np.frombuffer(b.encode("utf-8"), dtype=np.uint8).astype(np.int64) + 2
    s = np.concatenate([xa, np.array([1], dtype=np.int64), xb])
    na = len(xa)
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    # best LCP between neighbors from different strings
    from_a = sa < na
    diff = from_a[1:] != from_a[:-1]
    if not diff.any():
        return 0
    return int(lcp[1:][diff].max())
