"""Suffix array / LCP / winnowing / substring-pair operator tests."""

import numpy as np
import pytest

from lsh_project_spark.config import SubstringConfig
from lsh_project_spark.functions.suffix import (
    lcp_array,
    longest_common_substring_len,
    suffix_array,
)
from lsh_project_spark.operators.substring import (
    _kgram_hashes,
    substring_pairs,
    winnowed_fingerprints,
)


def _naive_sa(s):
    return np.array(sorted(range(len(s)), key=lambda i: s[i:]), dtype=np.int64)


@pytest.mark.parametrize("text", ["banana", "mississippi", "abcabcabc", "zzzz", "a"])
def test_suffix_array_matches_naive(text):
    s = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int64)
    assert (suffix_array(s) == _naive_sa(text)).all()


def test_suffix_array_random():
    rng = np.random.Generator(np.random.PCG64(5))
    for _ in range(5):
        s = rng.integers(0, 4, size=200)
        text = "".join("abcd"[i] for i in s)
        assert (suffix_array(s) == _naive_sa(text)).all()


def test_lcp_array():
    text = "banana"
    s = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int64)
    sa = suffix_array(s)
    lcp = lcp_array(s, sa)
    # sa: a, ana, anana, banana, na, nana -> lcp: 0,1,3,0,0,2
    assert list(lcp) == [0, 1, 3, 0, 0, 2]


def _naive_lcs(a, b):
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


@pytest.mark.parametrize(
    "a,b",
    [
        ("hello world", "goodbye world"),
        ("abcdef", "xyz"),
        ("the quick brown fox", "a quick brown cat"),
        ("", "abc"),
        ("same", "same"),
    ],
)
def test_lcs_exact(a, b):
    assert longest_common_substring_len(a, b) == _naive_lcs(a, b)


def test_winnowing_guarantee():
    """Any shared substring >= min_length must share a fingerprint."""
    cfg = SubstringConfig(min_length=50, kgram=20)
    rng = np.random.Generator(np.random.PCG64(9))

    def rand_text(n):
        return "".join("abcdefgh "[i] for i in rng.integers(0, 9, n))

    shared = rand_text(60)  # > min_length
    a = rand_text(100) + shared + rand_text(80)
    b = rand_text(50) + shared + rand_text(120)
    ha = _kgram_hashes(a, cfg.kgram)
    hb = _kgram_hashes(b, cfg.kgram)

    def winnow(h, w):
        win = np.lib.stride_tricks.sliding_window_view(h, w)
        return set(np.unique(win.min(axis=1)).tolist())

    assert winnow(ha, cfg.window) & winnow(hb, cfg.window)


def test_substring_pairs_spark(spark):
    cfg = SubstringConfig(min_length=50, kgram=20)
    shared = "the quick brown fox jumps over the lazy dog and then runs far away home"
    docs = [
        (0, "prefix one " + shared + " suffix alpha"),
        (1, "totally different beginning " + shared),
        (2, "no overlap here at all just some random words repeated random words"),
        (3, "another completely unrelated document about spark and parquet files"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["a"], r["b"]): r["lcs_len"] for r in substring_pairs(df, cfg).collect()}
    assert set(got) == {(0, 1)}
    assert got[(0, 1)] >= len(shared)


def test_winnowed_fingerprints_deterministic(spark):
    cfg = SubstringConfig()
    docs = [(0, "abcdefghijklmnopqrstuvwxyz " * 5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = sorted(r["fp"] for r in winnowed_fingerprints(df, cfg).collect())
    b = sorted(r["fp"] for r in winnowed_fingerprints(df, cfg).collect())
    assert a == b and len(a) > 0
