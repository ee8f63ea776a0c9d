"""Checkpoint / lineage / resume layer.

Every pipeline stage can be materialized to Parquet (Iceberg-style layout:
data files + a JSON manifest) keyed by a content hash of (stage name,
config hash, upstream manifest hashes).  A rerun with identical config and
inputs skips completed stages; any config or upstream change invalidates
exactly the downstream stages.  Mandated by the dedup graft ("resumable
from checkpoint with per-partition lineage + metrics").

Manifest schema (``_stage_manifest.json``):
  stage        stage name
  key          16-hex content hash (identity of this materialization)
  config_hash  PipelineConfig.config_hash()
  parents      upstream manifest keys
  rows         row count
  partitions   number of written files
  per_partition row counts  (lineage: which partition carried what)
  written_at   ISO timestamp (informational only; not part of the key)
"""

from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime, timezone

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_stage_manifest.json"


def stage_key(stage: str, config_hash: str, parent_keys: list[str]) -> str:
    payload = json.dumps(
        {"stage": stage, "config": config_hash, "parents": sorted(parent_keys)},
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class CheckpointedPipeline:
    """Stage runner with skip-if-complete semantics.

    Usage:
        cp = CheckpointedPipeline(spark, root, config_hash)
        profile = cp.stage("profile", [], lambda: multimodal_profile(...))
        pairs   = cp.stage("pairs", ["profile"], lambda: ...)
    """

    def __init__(self, spark: SparkSession, root: str, config_hash: str):
        self.spark = spark
        self.root = root
        self.config_hash = config_hash
        self.keys: dict[str, str] = {}
        self.manifests: dict[str, dict] = {}
        os.makedirs(root, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def is_complete(self, stage: str, key: str) -> bool:
        mpath = os.path.join(self._path(stage), MANIFEST)
        if not os.path.exists(mpath):
            return False
        try:
            with open(mpath) as f:
                manifest = json.load(f)
        except (json.JSONDecodeError, OSError):
            return False
        return manifest.get("key") == key

    def stage(
        self, stage: str, parents: list[str], build, extra_metrics=None
    ) -> DataFrame:
        """Return the stage DataFrame, reading from the checkpoint if this
        exact (config, upstream) combination already completed.

        ``extra_metrics``: optional zero-arg callable returning a dict of
        stage-specific metrics recorded in the manifest (evaluated only
        when the stage actually builds — e.g. the candidate stage's
        hot-bucket drop accounting)."""
        parent_keys = [self.keys[p] for p in parents]
        key = stage_key(stage, self.config_hash, parent_keys)
        self.keys[stage] = key
        path = self._path(stage)

        if not self.is_complete(stage, key):
            df = build()
            df.write.mode("overwrite").parquet(path)
            written = self.spark.read.parquet(path)
            per_part = (
                written.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .collect()
            )
            manifest = {
                "stage": stage,
                "key": key,
                "config_hash": self.config_hash,
                "parents": parent_keys,
                "rows": int(sum(r["count"] for r in per_part)),
                "partitions": len(per_part),
                "per_partition": {str(r["pid"]): int(r["count"]) for r in per_part},
                "written_at": datetime.now(timezone.utc).isoformat(),
            }
            if extra_metrics is not None:
                manifest.update(extra_metrics())
            with open(os.path.join(path, MANIFEST), "w") as f:
                json.dump(manifest, f, indent=2, sort_keys=True)
            self.manifests[stage] = manifest
        else:
            with open(os.path.join(path, MANIFEST)) as f:
                self.manifests[stage] = json.load(f)
        return self.spark.read.parquet(path)


def checkpointed_dedup(
    spark: SparkSession, images: DataFrame, root: str, cfg=None
) -> DataFrame:
    """The flagship pipeline with per-stage checkpoints: kill it after any
    stage and rerun — completed stages are skipped, output is identical."""
    from .config import PipelineConfig
    from .operators.candidates import candidate_pairs
    from .operators.cluster import assign_clusters
    from .operators.profile import (
        multimodal_profile,
        profile_signatures,
        verify_pairs_from_profile,
    )

    cfg = cfg or PipelineConfig()
    # "+longkey" salts every stage key: stage keys are name+config+parents
    # (not content), so without the salt a resume could mix checkpoints of
    # the pre-round-6 string-keyed composition with the hashed-id stages
    # below — the map-back join would then see string ids where it expects
    # int64 hashes.  Old roots are simply rebuilt, never misread.
    cp = CheckpointedPipeline(spark, root, cfg.config_hash() + "+longkey")

    slim = images.select("image_id", "caption", "phash")
    # same 8-byte hot path as dedup_pipeline (see pipeline.py): hashed ids
    # through every checkpointed stage, string ids rejoin in the
    # assignments stage via map_back_assignments
    idmap = slim.select(F.xxhash64("image_id").alias("hid"), "image_id")
    slim = slim.select(
        F.xxhash64("image_id").alias("image_id"), "caption", "phash"
    )
    profile = cp.stage("profile", [], lambda: multimodal_profile(slim, cfg))
    dstats: dict = {}
    cands = cp.stage(
        "candidates",
        ["profile"],
        lambda: candidate_pairs(
            profile_signatures(profile, cfg).select(
                "image_id",
                F.xxhash64("modality", "band", "bucket").alias("bucket"),
            ),
            bucket_cols=("bucket",),
            hot_bucket_threshold=cfg.hot_bucket_threshold,
            drop_stats=dstats,
        ),
        # the skew defense's exact recall-loss budget rides in the manifest
        # (hot_pairs_dropped = C(n,2) - (n-1) summed over hot buckets), so
        # a production run records what its star defense dropped
        extra_metrics=lambda: {
            f"hot_{k}": int(v)
            for k, v in dstats["df"].collect()[0].asDict().items()
        } if "df" in dstats else {},
    )
    pairs = cp.stage(
        "verified_pairs",
        ["profile", "candidates"],
        lambda: verify_pairs_from_profile(cands, profile, cfg),
    )
    asg_parents = ["profile", "verified_pairs"]
    if cfg.substring_enabled:
        from .operators.substring import substring_pairs

        sub = cp.stage(
            "substring_pairs",
            [],
            lambda: substring_pairs(
                slim.select("image_id", F.col("caption").alias("text")),
                cfg.substring,
                id_col="image_id",
                text_col="text",
            ).select("a", "b"),
        )
        pairs = pairs.unionByName(sub).dropDuplicates(["a", "b"])
        asg_parents.append("substring_pairs")
    from .pipeline import map_back_assignments

    return cp.stage(
        "assignments",
        asg_parents,
        lambda: map_back_assignments(
            assign_clusters(profile, pairs, id_col="image_id"), idmap
        ),
    )
