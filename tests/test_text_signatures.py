"""MinHash / SimHash: Spark JVM path vs Python oracle parity, and
statistical sanity (estimated vs exact Jaccard)."""

import numpy as np
import pytest

from lsh_project_spark.config import MinHashConfig, SimHashConfig
from lsh_project_spark.operators.signatures import (
    minhash_band_table,
    simhash_table,
)
from lsh_project_spark.oracle.minhash import (
    band_hashes,
    exact_jaccard,
    minhash_signature,
    shingles,
)
from lsh_project_spark.oracle.simhash import hamming, simhash64

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the old river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the old river bend"),
    (2, "a completely different sentence about spark shuffles and parquet files"),
    (3, "the quick brown fox jumps over the lazy dog near the old river bank"),
    (4, "tiny"),
]


def test_shingles_small_doc():
    assert shingles("tiny", 3) == {"tiny"}
    assert shingles("a b c d", 3) == {"a b c", "b c d"}


def test_exact_jaccard_bounds():
    assert exact_jaccard(DOCS[0][1], DOCS[3][1], 3) == 1.0
    assert exact_jaccard(DOCS[0][1], DOCS[2][1], 3) == 0.0
    j = exact_jaccard(DOCS[0][1], DOCS[1][1], 3)
    assert 0.5 < j < 1.0


def test_minhash_estimates_jaccard():
    cfg = MinHashConfig(num_perm=256, num_bands=64)
    rng = np.random.Generator(np.random.PCG64(11))
    vocab = [f"w{i}" for i in range(50)]
    a = " ".join(vocab[i] for i in rng.integers(0, 50, 60))
    toks = a.split()
    toks[10], toks[30] = "xx", "yy"
    b = " ".join(toks)
    sa, sb = minhash_signature(a, cfg), minhash_signature(b, cfg)
    est = (sa == sb).mean()
    exact = exact_jaccard(a, b, cfg.shingle_size)
    assert abs(est - exact) < 0.12


def test_minhash_band_spark_matches_oracle(spark):
    cfg = MinHashConfig()
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["band_idx"]): r["band_hash"]
        for r in minhash_band_table(docs, cfg).collect()
    }
    for doc_id, text in DOCS:
        sig = minhash_signature(text, cfg)
        bh = band_hashes(sig, cfg)
        for band in range(cfg.num_bands):
            assert got[(doc_id, band)] == bh[band], (doc_id, band)


def test_simhash_spark_matches_oracle(spark):
    cfg = SimHashConfig()
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in simhash_table(docs, cfg).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == simhash64(text), doc_id


def test_simhash_similarity_property():
    a = simhash64(DOCS[0][1])
    b = simhash64(DOCS[1][1])
    c = simhash64(DOCS[2][1])
    assert hamming(a, b) < hamming(a, c)
    assert a == simhash64(DOCS[3][1])
