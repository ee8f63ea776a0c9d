"""The fused Arrow profile stage (operators/profile.py) must agree
bit-exactly with the component oracles / JVM paths it fuses."""

import numpy as np
import pyspark.sql.functions as F

from lsh_project_spark.config import PipelineConfig
from lsh_project_spark.oracle import cp_signatures
from lsh_project_spark.oracle.minhash import band_hashes, minhash_signature, shingles
from lsh_project_spark.oracle.simhash import simhash64
from lsh_project_spark.operators.profile import multimodal_profile
from lsh_project_spark.params import fold_rotations
from lsh_project_spark.sources.codecs import phash_to_vector
from lsh_project_spark.functions.hashing import portable_hash62_py

ROWS = [
    ("a1", "the quick brown fox jumps over the lazy dog by the river", 123456789),
    ("a2", "tiny", -42),
    ("a3", "spark arrow batch matmul signature verify cluster " * 2, 2**62 - 7),
    ("a4", "the quick brown fox jumps over the lazy dog by the river", 123456789),
]


def test_profile_matches_component_oracles(spark):
    cfg = PipelineConfig()
    df = spark.createDataFrame(ROWS, "image_id string, caption string, phash long")
    prof = {r["image_id"]: r for r in multimodal_profile(df, cfg).collect()}
    rot = fold_rotations(cfg.cp)
    for image_id, caption, phash in ROWS:
        r = prof[image_id]
        # CP buckets == numpy oracle
        expect_cp = cp_signatures(phash_to_vector(np.array([phash])), rot)[0]
        assert list(r["cp_buckets"]) == list(expect_cp)
        # MinHash bands == python oracle
        expect_mh = band_hashes(minhash_signature(caption, cfg.minhash), cfg.minhash)
        assert list(r["mh_bands"]) == list(expect_mh)
        # SimHash == python oracle
        assert r["simhash"] == simhash64(caption)
        # shingle-hash set == oracle shingles hashed (int32-shifted)
        expect_hs = sorted(
            {
                (portable_hash62_py(s) % (1 << 32)) - (1 << 31)
                for s in shingles(caption, cfg.minhash.shingle_size)
            }
        )
        assert sorted(r["hs"]) == expect_hs


def test_profile_matches_jvm_signature_path(spark):
    """Fused UDF == JVM expression path (used by the DuckDB-checked
    queries) on the same rows."""
    from lsh_project_spark.operators.signatures import (
        minhash_band_table,
        simhash_table,
    )

    cfg = PipelineConfig()
    df = spark.createDataFrame(ROWS, "image_id string, caption string, phash long")
    docs = df.select(F.col("image_id").alias("doc_id"), F.col("caption").alias("text"))
    jvm_mh = {
        (r["doc_id"], r["band_idx"]): r["band_hash"]
        for r in minhash_band_table(docs, cfg.minhash).collect()
    }
    jvm_sh = {r["doc_id"]: r["simhash"] for r in simhash_table(docs, cfg.simhash).collect()}
    prof = {r["image_id"]: r for r in multimodal_profile(df, cfg).collect()}
    for image_id, _, _ in ROWS:
        for band in range(cfg.minhash.num_bands):
            assert prof[image_id]["mh_bands"][band] == jvm_mh[(image_id, band)]
        assert prof[image_id]["simhash"] == jvm_sh[image_id]
