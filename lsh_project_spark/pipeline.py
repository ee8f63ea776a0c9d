"""End-to-end near-duplicate detection & clustering pipeline.

images(image_id, bytes, w, h, fmt, caption, phash)
  -> featurize (phash -> unit ±1/8 vectors; the reference's data model)
  -> CP-LSH signature table           (reference semantics, batched matmul)
  -> MinHash band table over captions (Broder '97, JVM-only)
  -> SimHash band table over captions (Charikar '02, JVM-only)
  -> candidate pairs per modality (bucket self-join, hot-bucket star defense)
  -> exact verify per modality (phash Hamming / shingle Jaccard)
  -> substring modality (winnow -> fp equi-join -> exact LCS verify)
  -> OR-union of verified pairs across ALL modalities
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
    shingle_expr,
    simhash_band_table,
    simhash_table,
)
from .operators.verify import verify_jaccard, verify_phash_hamming


@dataclass
class PipelineResult:
    assignments: DataFrame  # (image_id, cluster_id)
    verified_pairs: DataFrame  # (a, b)
    # 1-row lazy DataFrame (hot_buckets, pairs_dropped, max_bucket): the
    # skew defense's exact recall-loss accounting (operators/candidates.py)
    drop_stats: DataFrame | None = None


def all_signatures(images: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Unified multi-modal signature table (image_id, modality, band, bucket).

    modality 0 = CP-LSH over phash vectors (reference semantics),
    modality 1 = MinHash bands over captions, modality 2 = SimHash bands.
    One union -> ONE bucket self-join downstream (instead of three), so the
    candidate stage pays one shuffle and one set of stages at any scale.
    """
    docs = images.select("image_id", F.col("caption").alias("text"))
    cp = cp_signature_table(features_from_phash(images), cfg.cp).select(
        "image_id",
        F.lit(0).alias("modality"),
        F.col("table_idx").cast("int").alias("band"),
        "bucket",
    )
    mh = minhash_band_table(docs, cfg.minhash, id_col="image_id").select(
        "image_id",
        F.lit(1).alias("modality"),
        F.col("band_idx").alias("band"),
        F.col("band_hash").alias("bucket"),
    )
    sh = simhash_band_table(
        simhash_table(docs, cfg.simhash, id_col="image_id"),
        cfg.simhash,
        id_col="image_id",
    ).select(
        "image_id",
        F.lit(2).alias("modality"),
        F.col("band_idx").alias("band"),
        F.col("band_hash").alias("bucket"),
    )
    return cp.unionByName(mh).unionByName(sh)


def verify_pairs_multimodal(
    cands: DataFrame, images: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """One combined exact-verify pass: a candidate pair is a duplicate if
    phash Hamming <= tau  OR  caption shingle-Jaccard >= tau.  Joins the
    (id, phash, shingles) projection twice — `bytes` never shuffles."""
    side = images.select(
        F.col("image_id").alias("_id"),
        F.col("phash").alias("_ph"),
        shingle_expr("caption", cfg.minhash.shingle_size).alias("_sh"),
    )
    a_side = side.select(
        F.col("_id").alias("a"), F.col("_ph").alias("pa"), F.col("_sh").alias("sa")
    )
    b_side = side.select(
        F.col("_id").alias("b"), F.col("_ph").alias("pb"), F.col("_sh").alias("sb")
    )
    return (
        cands.join(a_side, "a")
        .join(b_side, "b")
        .filter(
            F.expr(
                f"bit_count(pa ^ pb) <= {cfg.phash_hamming_threshold} OR "
                f"(size(array_intersect(sa, sb)) / size(array_union(sa, sb)))"
                f" >= {cfg.jaccard_threshold}"
            )
        )
        .select("a", "b")
    )


def map_back_assignments(assignments_h: DataFrame, idmap: DataFrame) -> DataFrame:
    """(hashed image_id, hashed cluster_id) -> (image_id, cluster_id) with
    every cluster relabeled to its min member STRING id — exactly the label
    the string-keyed plan (and the DuckDB recursive-CTE oracle) produces.
    ``idmap`` is the narrow (hid, image_id) map, one row per input row; AQE
    broadcasts it at bench scale, and at warehouse scale these are the only
    two string shuffles left in the whole pipeline."""
    named = (
        assignments_h.withColumnRenamed("image_id", "_hid")
        .join(idmap, F.col("_hid") == idmap["hid"])
        .select("image_id", F.col("cluster_id").alias("_ch"))
    )
    labels = named.groupBy("_ch").agg(F.min("image_id").alias("cluster_id"))
    return named.join(labels, "_ch").select("image_id", "cluster_id")


def dedup_pipeline(images: DataFrame, cfg: PipelineConfig | None = None) -> PipelineResult:
    """Production path: ONE fused Arrow-vectorized signature stage
    (operators/profile.py — the reference's bulked model), a single unified
    bucket self-join, a compact int-array verify, then CC clustering."""
    from .operators.profile import (
        multimodal_profile,
        profile_signatures,
        verify_pairs_from_profile,
    )
    from pyspark.storagelevel import StorageLevel

    cfg = cfg or PipelineConfig()
    slim = images.select("image_id", "caption", "phash")
    # the Arrow profile stage parallelizes over INPUT partitions; a compact
    # parquet (few row groups) would starve the Python workers.  Only
    # repartition when the scan is narrower than the cluster — at real
    # scale inputs have plenty of splits and this is a no-op.
    spark = images.sparkSession
    target = spark.sparkContext.defaultParallelism
    if slim.rdd.getNumPartitions() < target:
        slim = slim.repartition(target)
    # Narrow the hot path to 8-byte keys: every shuffle between here and
    # the final map-back (two collect_list aggregation levels, pair dedup,
    # the verify self-joins, and every CC round) moves xxhash64(image_id)
    # longs instead of variable-length id strings — the byte attribution
    # (scripts/probe_bytes.py) showed those ObjectHashAggregate/Generate
    # stages own most of the pipeline's shuffle volume, and the quad-probe
    # hardware bracket pins the scaling shortfall on shared-DRAM bytes.
    # Components are invariant under the key swap (hot-bucket star edges
    # keep each bucket connected regardless of which member is the hub;
    # cold pairs / verify / substring accepts are id-independent), and the
    # map-back relabels every cluster to its min STRING id, so the output
    # is bit-identical to the string-keyed plan.  Collision risk is the
    # same negligible class as the 62-bit fingerprints the candidate stage
    # already relies on (~n^2/2^65); a 100 TB deployment would mint dense
    # int64 ids at ingest instead of hashing.  Inputs whose ids are ALREADY
    # 8-byte longs (e.g. the oracle-portable fixture) skip the hash AND the
    # whole map-back tail — connected components already label every
    # cluster with its min member id, which for raw longs IS the final
    # label (same rule as substring_pairs / near_dup_pairs).
    hash_ids = dict(slim.dtypes)["image_id"] == "string"
    if hash_ids:
        idmap = slim.select(F.xxhash64("image_id").alias("hid"), "image_id")
        slim = slim.select(
            F.xxhash64("image_id").alias("image_id"), "caption", "phash"
        )
    profile = multimodal_profile(slim, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    # materialize the cache BEFORE the plan fans out: the profile feeds the
    # signature union, both verify sides, and the cluster node list, and
    # AQE submits those independent first-wave stages CONCURRENTLY — on a
    # cold cache each of them recomputes the whole Arrow profile stage
    # (measured: 11 simultaneous ~4.5 s jobs at bench scale, all burning
    # cores on identical work).  One count pins the cache; every
    # downstream stage then reads it.
    profile.count()
    # pack (modality, band, bucket) into one 64-bit key: the salted
    # aggregation, its bucket-total window, and the cold regroup all key on
    # it, so one long instead of three columns narrows every one of those
    # shuffles.  A cross-bucket hash collision (~rows^2/2^65) can only MERGE
    # two buckets, adding false candidates the exact verify removes.
    sigs = profile_signatures(profile, cfg).select(
        "image_id", F.xxhash64("modality", "band", "bucket").alias("bucket")
    )
    dstats: dict = {}
    cands = candidate_pairs(
        sigs,
        bucket_cols=("bucket",),
        hot_bucket_threshold=cfg.hot_bucket_threshold,
        drop_stats=dstats,
    )
    pairs = verify_pairs_from_profile(cands, profile, cfg)
    if cfg.substring_enabled:
        # OR-union the substring modality (winnow -> fp join -> exact LCS
        # verify) into the edge set before clustering: the engine's output
        # is the OR of ALL duplicate modalities (SURVEY.md §7 M2) — a pair
        # sharing a >= min_length caption substring is a duplicate even
        # when its phash Hamming and shingle Jaccard both miss
        from .operators.substring import substring_pairs

        sub = substring_pairs(
            slim.select("image_id", F.col("caption").alias("text")),
            cfg.substring,
            id_col="image_id",
            text_col="text",
        ).select("a", "b")
        pairs = pairs.unionByName(sub).dropDuplicates(["a", "b"])
    # verified pairs feed clustering 2-3 times (fast-path count + collect,
    # or the distributed loop's seed checkpoint) — persist so the verify
    # join chain runs once
    pairs = pairs.persist(StorageLevel.MEMORY_AND_DISK)
    assignments_h = assign_clusters(profile, pairs, id_col="image_id")
    if not hash_ids:
        # raw long ids: CC's labels (min member per component) and the
        # pair list already carry the original ids — no map-back tail
        return PipelineResult(
            assignments=assignments_h,
            verified_pairs=pairs.select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            ),
            drop_stats=dstats.get("df"),
        )
    assignments = map_back_assignments(assignments_h, idmap)
    map_a = idmap.select(
        F.col("hid").alias("_ha"), F.col("image_id").alias("_ia")
    )
    map_b = idmap.select(
        F.col("hid").alias("_hb"), F.col("image_id").alias("_ib")
    )
    pairs_str = (
        pairs.join(map_a, pairs["a"] == F.col("_ha"))
        .join(map_b, pairs["b"] == F.col("_hb"))
        .select(
            F.least("_ia", "_ib").alias("a"),
            F.greatest("_ia", "_ib").alias("b"),
        )
    )
    return PipelineResult(
        assignments=assignments,
        verified_pairs=pairs_str,
        drop_stats=dstats.get("df"),
    )


# -------- per-modality variants (kept for stage attribution / diagnostics)


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


def pair_recall(found_pairs: DataFrame, true_pairs: DataFrame) -> float:
    """dup-pair recall = |found ∩ true| / |true| (the graft's rendering of
    the reference's '% neighbours found', /root/reference/src/main.cc:600-607)."""
    tp = true_pairs.select("a", "b").dropDuplicates(["a", "b"])
    n_true = tp.count()
    if n_true == 0:
        return 1.0
    n_hit = tp.join(found_pairs.select("a", "b"), ["a", "b"], "left_semi").count()
    return n_hit / n_true
