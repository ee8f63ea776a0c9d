"""CP-LSH kernel unit tests: Hadamard construction, rotation fold, hash
semantics incl. tie rules (SURVEY.md §5.2 'unit: kernels')."""

import numpy as np

from lsh_project_spark.config import CrossPolytopeConfig
from lsh_project_spark.oracle import brute_force_nn, concat_hashes, cp_hash, cp_signatures
from lsh_project_spark.params import fold_rotations, hadamard_matrix, rotation_diagonals


def test_hadamard_orthonormal():
    for d in (4, 8, 64, 128):
        h = hadamard_matrix(d)
        assert np.allclose(h @ h.T, np.eye(d), atol=1e-5)


def test_hadamard_popcount_identity():
    h = hadamard_matrix(8)
    # H[i][j] = 8^-0.5 * (-1)^popcount(i & j)
    for i in range(8):
        for j in range(8):
            expect = 8**-0.5 * (-1) ** bin(i & j).count("1")
            assert abs(h[i, j] - expect) < 1e-6


def test_cp_hash_basic_and_ties():
    # index of max |coordinate|; i for +, i+d for -
    assert cp_hash(np.array([[0.1, 0.9, -0.2, 0.0]]))[0] == 1
    assert cp_hash(np.array([[0.1, -0.9, 0.2, 0.0]]))[0] == 1 + 4
    # positive wins at equal magnitude (reference checks +x[i] first)
    assert cp_hash(np.array([[-0.5, 0.5]]))[0] == 1
    assert cp_hash(np.array([[0.5, -0.5]]))[0] == 0
    # first index wins on equal values (numpy argmax = first index)
    assert cp_hash(np.array([[0.5, 0.5]]))[0] == 0
    assert cp_hash(np.array([[-0.5, -0.5]]))[0] == 0 + 2


def test_concat_hashes_shift_or():
    # cldim = ceil(log2 d)+1; d=4 -> 3 bits per sub-hash
    h = np.array([[1, 5]])  # (1 << 3) | 5 = 13
    assert concat_hashes(h, 4)[0] == 13


def test_rotation_fold_is_orthogonal():
    cfg = CrossPolytopeConfig(dim=64, k=2, num_tables=4)
    rot = fold_rotations(cfg)
    assert rot.shape == (4, 2, 64, 64)
    for t in range(4):
        for j in range(2):
            m = rot[t, j].astype(np.float64)
            assert np.allclose(m @ m.T, np.eye(64), atol=1e-4)


def test_rotation_diagonals_pm1_and_deterministic():
    cfg = CrossPolytopeConfig(dim=8, k=2, num_tables=2)
    d1, d2 = rotation_diagonals(cfg), rotation_diagonals(cfg)
    assert (d1 == d2).all()
    assert set(np.unique(d1)) == {-1.0, 1.0}


def test_cp_signatures_shape_range_determinism():
    cfg = CrossPolytopeConfig(dim=64, k=2, num_tables=8)
    rng = np.random.Generator(np.random.PCG64(3))
    x = rng.normal(size=(32, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    rot = fold_rotations(cfg)
    s1, s2 = cp_signatures(x, rot), cp_signatures(x, rot)
    assert (s1 == s2).all()
    assert s1.shape == (32, 8)
    assert s1.min() >= 0 and s1.max() < (1 << (2 * cfg.cldim))


def test_identical_vectors_identical_signatures():
    cfg = CrossPolytopeConfig(dim=64)
    rot = fold_rotations(cfg)
    rng = np.random.Generator(np.random.PCG64(4))
    x = rng.normal(size=(1, 64)).astype(np.float32)
    x /= np.linalg.norm(x)
    both = np.vstack([x, x])
    s = cp_signatures(both, rot)
    assert (s[0] == s[1]).all()


def test_lsh_recall_on_noisy_queries():
    """The reference's own acceptance style: % neighbours found vs linear
    scan on noisy-copy queries (src/main.cc:76-88, 565-607) — scaled down."""
    cfg = CrossPolytopeConfig(dim=64, k=1, num_tables=8)
    rng = np.random.Generator(np.random.PCG64(5))
    n, q = 2048, 128
    data = rng.normal(size=(n, 64)).astype(np.float32)
    data /= np.linalg.norm(data, axis=1, keepdims=True)
    pick = rng.integers(0, n, size=q)
    queries = 0.95 * data[pick] + 0.05 * rng.normal(size=(q, 64)).astype(np.float32)
    truth = brute_force_nn(queries, data)
    rot = fold_rotations(cfg)
    dsig = cp_signatures(data, rot)
    qsig = cp_signatures(queries, rot)
    found = 0
    for i in range(q):
        cands = np.unique(np.where((dsig == qsig[i][None, :]).any(axis=1))[0])
        if len(cands):
            scores = data[cands] @ queries[i]
            if cands[np.argmax(scores)] == truth[i]:
                found += 1
    assert found / q >= 0.9
