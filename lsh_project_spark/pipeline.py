"""End-to-end near-duplicate detection & clustering pipeline.

images(image_id, bytes, w, h, fmt, caption, phash)
  -> featurize (phash -> unit ±1/8 vectors; the reference's data model)
  -> CP-LSH signature table           (reference semantics, batched matmul)
  -> MinHash band table over captions (Broder '97, JVM-only)
  -> SimHash band table over captions (Charikar '02, JVM-only)
  -> candidate pairs per modality (bucket self-join, hot-bucket star defense)
  -> exact verify per modality (phash Hamming / shingle Jaccard)
  -> OR-union of verified pairs
  -> large-star/small-star connected components
  -> (image_id, cluster_id)

Column discipline: `bytes` is projected away before the first shuffle and
never reappears (SURVEY.md §4 "keep image bytes out of every shuffle").
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .config import PipelineConfig
from .operators.candidates import candidate_pairs
from .operators.cluster import assign_clusters
from .operators.featurize import features_from_phash
from .operators.signatures import (
    cp_signature_table,
    minhash_band_table,
    simhash_band_table,
    simhash_table,
)
from .operators.verify import verify_jaccard, verify_phash_hamming


@dataclass
class PipelineResult:
    assignments: DataFrame  # (image_id, cluster_id)
    verified_pairs: DataFrame  # (a, b)


def verified_image_pairs(images: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """CP-LSH over phash vectors -> candidates -> exact Hamming verify."""
    feats = features_from_phash(images)
    sigs = cp_signature_table(feats, cfg.cp)
    cands = candidate_pairs(
        sigs, hot_bucket_threshold=cfg.hot_bucket_threshold
    )
    return verify_phash_hamming(cands, images, cfg.phash_hamming_threshold)


def verified_caption_pairs(images: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """MinHash + SimHash band LSH over captions -> exact Jaccard verify."""
    docs = images.select("image_id", F.col("caption").alias("text"))
    mh = minhash_band_table(docs, cfg.minhash, id_col="image_id")
    mh_cands = candidate_pairs(
        mh,
        id_col="image_id",
        bucket_cols=("band_idx", "band_hash"),
        hot_bucket_threshold=cfg.hot_bucket_threshold,
    )
    sh = simhash_band_table(
        simhash_table(docs, cfg.simhash, id_col="image_id"),
        cfg.simhash,
        id_col="image_id",
    )
    sh_cands = candidate_pairs(
        sh,
        id_col="image_id",
        bucket_cols=("band_idx", "band_hash"),
        hot_bucket_threshold=cfg.hot_bucket_threshold,
    )
    cands = mh_cands.unionByName(sh_cands).dropDuplicates(["a", "b"])
    return verify_jaccard(
        cands,
        docs,
        cfg.minhash.shingle_size,
        cfg.jaccard_threshold,
        id_col="image_id",
    ).select("a", "b")


def dedup_pipeline(images: DataFrame, cfg: PipelineConfig | None = None) -> PipelineResult:
    cfg = cfg or PipelineConfig()
    slim = images.select("image_id", "caption", "phash")
    img_pairs = verified_image_pairs(slim, cfg)
    cap_pairs = verified_caption_pairs(slim, cfg)
    pairs = img_pairs.unionByName(cap_pairs).dropDuplicates(["a", "b"])
    assignments = assign_clusters(slim, pairs, id_col="image_id")
    return PipelineResult(assignments=assignments, verified_pairs=pairs)


def pair_recall(found_pairs: DataFrame, true_pairs: DataFrame) -> float:
    """dup-pair recall = |found ∩ true| / |true| (the graft's rendering of
    the reference's '% neighbours found', /root/reference/src/main.cc:600-607)."""
    tp = true_pairs.select("a", "b").dropDuplicates(["a", "b"])
    n_true = tp.count()
    if n_true == 0:
        return 1.0
    n_hit = tp.join(found_pairs.select("a", "b"), ["a", "b"], "left_semi").count()
    return n_hit / n_true
