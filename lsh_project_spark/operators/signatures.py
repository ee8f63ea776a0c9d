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
from ..functions.hashing import PORTABLE_HASH_MOD, hash62_pandas_udf, minhash_params
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


def minhash_band_table(
    docs: DataFrame, cfg: MinHashConfig, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text) -> (id, band_idx, band_hash): MinHash signatures banded for
    LSH, entirely with JVM expressions (no Python in the plan).

    Per permutation i: mh_i = min over shingles of (a_i * h32 + b_i) mod p.
    Band hash = sum over the band's rows of ((mh_i % 2^32) * c_i) % p —
    order-independent, so no sort inside the aggregation.

    Plan shape (scale-critical): hash62 is evaluated ONCE per shingle as one
    Arrow-vectorized projection (numpy inside a pandas UDF — the portable
    family's fast rendering; bit-identical to the SQL renderings), the only
    shuffle is the per-doc collect_set of 32-bit shingle hashes (bounded by
    tokens/doc), and the num_perm mins + band sums run as tight higher-order
    array expressions inside whole-stage codegen — no num_perm-times row
    explosion through the exchange.
    """
    P = PORTABLE_HASH_MOD
    a, b, c = minhash_params(cfg.num_perm, cfg.seed)
    ab_arr = "array(" + ", ".join(
        f"named_struct('a', {int(a[i])}L, 'b', {int(b[i])}L)"
        for i in range(cfg.num_perm)
    ) + ")"
    c_arr = "array(" + ", ".join(f"{int(c[i])}L" for i in range(cfg.num_perm)) + ")"
    r = cfg.rows_per_band
    h62 = hash62_pandas_udf()
    hashed = docs.select(
        F.col(id_col),
        F.explode(shingle_expr(text_col, cfg.shingle_size)).alias("shingle"),
    ).select(id_col, (h62(F.col("shingle")) % F.lit(4294967296)).alias("h32"))
    sigs = hashed.groupBy(id_col).agg(F.collect_set("h32").alias("hs"))
    mh = sigs.select(
        id_col,
        F.expr(
            f"transform({ab_arr}, p -> "
            f"array_min(transform(hs, h -> (p.a * h + p.b) % {P})))"
        ).alias("mh"),
    )
    return mh.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {cfg.num_bands - 1}), j -> struct("
                f"cast(j as int) as band_idx, "
                f"aggregate(slice(zip_with(mh, {c_arr}, "
                f"(m, cc) -> ((m % 4294967296) * cc) % {P}), "
                f"j * {r} + 1, {r}), cast(0 as bigint), (acc, x) -> acc + x) "
                f"as band_hash))"
            )
        ).alias("bb"),
    ).select(id_col, "bb.band_idx", "bb.band_hash")


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
    """
    h62 = hash62_pandas_udf()
    hashed = docs.select(
        F.col(id_col), F.explode(shingle_expr(text_col, 3)).alias("tok")
    ).select(
        id_col,
        F.shiftright(h62(F.col("tok")), 4).alias("h"),
        F.shiftright(h62(F.concat(F.lit(SIMHASH_SALT), F.col("tok"))), 4).alias("h2"),
    )

    def fold(col: str) -> str:
        # one shuffle (collect per-doc token hashes), then bit votes +
        # fingerprint fold as whole-stage-codegen higher-order expressions
        return (
            f"aggregate(sequence(0, {SIMHASH_BITS - 1}), cast(0 as bigint), "
            f"(fp, b) -> fp + (case when "
            f"aggregate(collect_list({col}), 0, "
            f"(acc, hh) -> acc + (case when (hh >> b) & 1 = 1 then 1 else -1 end)) > 0 "
            f"then shiftleft(cast(1 as bigint), b) else cast(0 as bigint) end))"
        )

    return hashed.groupBy(id_col).agg(
        F.expr(fold("h")).alias("simhash"), F.expr(fold("h2")).alias("simhash2")
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
