"""Signature operators: CP-LSH buckets, MinHash bands, SimHash bands.

CP-LSH (the reference's core, /root/reference/src/lsh.c:328-342 +
src/main.cc:294-323) runs as ONE batched numpy matmul per Arrow record
batch — the Spark-native form of the reference's "bulked" kernels
(src/lsh.c:466-536, bulk=512): `batch[B,d] @ RotMat2d[d, L*k*d]` computes
every table's every hash at once, then a vectorized argmax + bit-concat.
The folded rotation tensor is broadcast via closure capture (~1 MiB).

MinHash and SimHash (no reference analog; SURVEY.md §2.9) are JVM column
expressions — split/transform/explode/groupBy — around ONE Arrow-vectorized
hash projection (the portable polynomial hash62 family,
functions/hashing.py), so the array folds stay inside whole-stage codegen
and everything matches the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..config import CrossPolytopeConfig, MinHashConfig, SimHashConfig
from ..functions.hashing import minhash_params
from ..oracle.lsh_core import concat_hashes, cp_hash
from ..params import fold_rotations

CP_SIG_SCHEMA = "image_id string, table_idx int, bucket long"


def cp_signature_table(
    features: DataFrame, cfg: CrossPolytopeConfig, id_col: str = "image_id"
) -> DataFrame:
    """(id, features[d]) -> exploded signature table (id, table_idx, bucket).

    This DataFrame *is* the reference's L hash tables
    (/root/reference/src/lsh.c:44,70-77): insertion = materialization,
    probe = equi-join on (table_idx, bucket).
    """
    rot = fold_rotations(cfg)  # [L,k,d,d], float32, tiny -> closure capture
    L, k, d, _ = rot.shape
    # one [d, L*k*d] operand so each Arrow batch is a single BLAS call
    rot2d = np.ascontiguousarray(rot.transpose(3, 0, 1, 2).reshape(d, L * k * d))

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["features"].to_numpy()).astype(np.float32)
            y = (x @ rot2d).reshape(len(pdf), L, k, d)
            buckets = concat_hashes(cp_hash(y), d)  # [B, L] int64
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), L),
                    "table_idx": np.tile(np.arange(L, dtype=np.int32), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    id_type = dict(features.dtypes)[id_col]
    schema = f"{id_col} {id_type}, table_idx int, bucket long"
    return features.mapInPandas(sign, schema=schema)


def cp_multiprobe_signature_table(
    features: DataFrame, cfg: CrossPolytopeConfig, probes: int,
    id_col: str = "image_id", rot: np.ndarray | None = None,
) -> DataFrame:
    """Query-side multi-probe CP-LSH: (id, features) -> (id, table_idx,
    bucket) with up to ``probes`` buckets per (row, table) — the base bucket
    plus the cheapest single sub-hash swaps, ranked by margin
    |y|_best - |y|_second (Lv et al. '07 multi-probe LSH; the analog of
    FALCONN's probing sequence, /root/reference/falconn/random_benchmark.cc:298).

    Probing multiplies per-table recall without growing the signature table:
    at equal recall an index needs fewer tables, i.e. fewer shuffled rows —
    the scale lever at 100 TB.

    ``rot`` overrides the folded rotation tensor [L, k, d, d] — the driver
    gate injects literal +-1 Hadamard*Rademacher matrices there so the
    float32 matmul is integer-exact and the probe sequence reproduces
    bit-for-bit in DuckDB SQL (plans/entry_queries.cp_multiprobe_buckets).
    """
    if rot is None:
        rot = fold_rotations(cfg)
    L, k, d, _ = rot.shape
    rot2d = np.ascontiguousarray(rot.transpose(3, 0, 1, 2).reshape(d, L * k * d))
    cldim = (d - 1).bit_length() + 1  # bits per sub-hash (concat_hashes)

    def sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            n = len(pdf)
            x = np.vstack(pdf["features"].to_numpy()).astype(np.float32)
            y = (x @ rot2d).reshape(n, L, k, d)
            take = np.take_along_axis
            # base sub-hashes via the EXACT data-side function (tie rules
            # included) so probe 0 always hits the indexed bucket
            h1 = cp_hash(y)  # [n, L, k], h = axis + d*(sign<0)
            ax = (h1 % d).astype(np.int64)
            abs_chosen = np.abs(take(y, ax[..., None], 3)[..., 0])
            ay = np.abs(y)
            np.put_along_axis(ay, ax[..., None], -1.0, axis=3)
            second_ax = np.argmax(ay, axis=3)
            second_val = take(y, second_ax[..., None], 3)[..., 0]
            h2 = second_ax + d * (second_val < 0)
            margin = abs_chosen - np.abs(second_val)  # [n, L, k] >= 0
            base = concat_hashes(h1, d)  # [n, L]
            ids, tids, buckets = [], [], []
            idv = pdf[id_col].to_numpy()
            # probe p swaps exactly one sub-hash j to h2; cheapest first
            swap_rank = np.argsort(margin, axis=2)  # [n, L, k]
            shift = cldim * (k - 1 - np.arange(k))  # bit offset of sub-hash j
            for p in range(min(probes, k + 1)):
                if p == 0:
                    b = base
                else:
                    j = swap_rank[:, :, p - 1]  # [n, L]
                    sh = shift[j]
                    old = take(h1, j[..., None], 2)[..., 0]
                    new = take(h2, j[..., None], 2)[..., 0]
                    b = base - (old << sh) + (new << sh)
                ids.append(np.repeat(idv, L))
                tids.append(np.tile(np.arange(L, dtype=np.int32), n))
                buckets.append(b.reshape(-1))
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(ids),
                    "table_idx": np.concatenate(tids),
                    "bucket": np.concatenate(buckets),
                }
            )

    id_type = dict(features.dtypes)[id_col]
    return features.mapInPandas(
        sign, schema=f"{id_col} {id_type}, table_idx int, bucket long"
    )


# --------------------------------------------------------------- MinHash (JVM)


def shingle_expr(text_col: str, k: int):
    """Word k-shingle array expression (JVM).  Documents with <= k tokens
    yield one whole-text shingle (matches oracle/minhash.shingles)."""
    toks = f"split({text_col}, ' ')"
    return F.expr(
        f"""
        case when size({toks}) <= {k} then array({text_col})
        else array_distinct(transform(
            sequence(0, size({toks}) - {k}),
            i -> concat_ws(' ', slice({toks}, i + 1, {k}))))
        end
        """
    )


def _widen_narrow_scan(df: DataFrame) -> DataFrame:
    """Round-robin a narrow scan across the cluster so the Arrow signature
    stage parallelizes; a no-op at real scale where inputs have plenty of
    splits (same pattern as pipeline.dedup_pipeline)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def minhash_band_table(
    docs: DataFrame, cfg: MinHashConfig, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text) -> (id, band_idx, band_hash): MinHash signatures banded
    for LSH — ONE Arrow-vectorized map stage, zero shuffles.

    Per permutation i: mh_i = min over shingles of (a_i * h32 + b_i) mod p.
    Band hash = sum over the band's rows of ((mh_i % 2^32) * c_i) % p —
    order-independent, so duplicates/order of the shingle hash set cannot
    change the result.

    Plan shape (scale-critical): each document's shingling, hashing,
    minima, and band sums all happen inside the scan's record batch via the
    shared numpy kernels (functions/textsig.py — the same code the fused
    profile stage runs, bit-identical by construction and pinned by
    tests/test_text_signatures.py).  Rounds <= 6 exploded one row per
    (doc, shingle) through an exchange and folded the minima with
    interpreted HOF lambdas — the shuffle AND the per-element interpreter
    are both gone (guide §2.4/§4.2), which is also the shape that scales:
    per-doc signatures come straight out of the scan."""
    a, b, c = minhash_params(cfg.num_perm, cfg.seed)
    n_bands, rpb = cfg.num_bands, cfg.rows_per_band
    shingle_k = cfg.shingle_size
    block = 2048

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.textsig import (
            minhash_bands_from_block,
            shingle_hash_block,
        )

        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf[text_col].fillna("").tolist()
            outs = []
            # sub-blocks bound the [shingles, num_perm] minhash matrix
            for lo in range(0, len(texts), block):
                blk = shingle_hash_block(texts[lo : lo + block], shingle_k)
                outs.append(
                    minhash_bands_from_block(
                        blk.h62, blk.inv, blk.starts, a, b, c, n_bands, rpb
                    )
                )
            mb = np.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_bands),
                    "band_idx": np.tile(
                        np.arange(n_bands, dtype=np.int32), len(pdf)
                    ),
                    "band_hash": mb.reshape(-1),
                }
            )

    id_type = dict(docs.dtypes)[id_col]
    return _widen_narrow_scan(docs.select(id_col, text_col)).mapInPandas(
        run, schema=f"{id_col} {id_type}, band_idx int, band_hash long"
    )


# --------------------------------------------------------------- SimHash (JVM)

SIMHASH_BITS = 56  # bits 0..55 of hash62 >> 4: every bit op stays in signed int64


SIMHASH_SALT = "s2:"  # prefix for the second independent fingerprint


def simhash_table(
    docs: DataFrame, cfg: SimHashConfig, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text) -> (id, simhash, simhash2): two independent 56-bit SimHash
    fingerprints over distinct word 3-shingles (the second uses a salted
    hash family — together they band into 4 x 28-bit slices, see
    SimHashConfig).  The per-shingle hash62 is ONE Arrow-vectorized
    projection; votes + fingerprint fold stay JVM higher-order expressions.

    bit b = 1 iff sum over shingles of (2*bit_b(hash56(shingle)) - 1) > 0,
    with hash56 = hash62 >> 4 (only bits 0..55 are read).  Shingle features
    (vs raw tokens) keep fingerprints spread out when the vocabulary is
    small — token-level SimHash collapses onto few values and floods the
    band buckets.

    Plan shape: ONE Arrow-vectorized map stage, zero shuffles — the same
    shared numpy kernels as the fused profile (functions/textsig.py), so
    the standalone table is bit-identical to the pipeline's fingerprints.
    Rounds <= 6 exploded per-shingle rows through an exchange and voted the
    56 bits with interpreted HOF folds over collect_list (guide §4.2: the
    per-element interpreter dominated)."""
    block = 2048

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.textsig import shingle_hash_block, simhash_from_block

        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf[text_col].fillna("").tolist()
            s1, s2 = [], []
            for lo in range(0, len(texts), block):
                blk = shingle_hash_block(texts[lo : lo + block], 3)
                s1.append(simhash_from_block(blk.h62, blk.inv, blk.starts))
                s2.append(
                    simhash_from_block(
                        blk.salted_h62(SIMHASH_SALT), blk.inv, blk.starts
                    )
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "simhash": np.concatenate(s1),
                    "simhash2": np.concatenate(s2),
                }
            )

    id_type = dict(docs.dtypes)[id_col]
    return _widen_narrow_scan(docs.select(id_col, text_col)).mapInPandas(
        run, schema=f"{id_col} {id_type}, simhash long, simhash2 long"
    )


def simhash_band_expr(cfg: SimHashConfig, col1: str = "simhash", col2: str = "simhash2") -> str:
    """SQL for the band bucket given band_idx: slices of the concatenated
    (simhash, simhash2) fingerprint, bits_per_band wide."""
    bpb, bph = cfg.bits_per_band, cfg.bands_per_hash
    mask = (1 << cfg.bits_per_band) - 1
    return (
        f"(case when band_idx < {bph} then {col1} >> (band_idx * {bpb}) "
        f"else {col2} >> ((band_idx - {bph}) * {bpb}) end) & {mask}"
    )


def simhash_band_table(
    simhashes: DataFrame, cfg: SimHashConfig, id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash, simhash2) -> (id, band_idx, band_hash): bit-slice
    banding over the concatenated 112-bit fingerprint.  Two fingerprints
    within Hamming r of each other collide on >= 1 band when banded into
    more than r slices (pigeonhole)."""
    return simhashes.select(
        id_col,
        F.explode(F.expr(f"sequence(0, {cfg.num_bands - 1})")).alias("band_idx"),
        "simhash",
        "simhash2",
    ).select(
        id_col,
        "band_idx",
        F.expr(simhash_band_expr(cfg)).alias("band_hash"),
    )
