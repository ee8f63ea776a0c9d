"""Incremental (streaming) near-duplicate detection.

Pattern: new rows arrive as a stream; each micro-batch is profiled with the
SAME fused Arrow signature UDF as the batch pipeline (operators/profile.py),
then joined against the accumulated signature store:

  new rows ──mapInPandas(profile)──► new signatures
  new sigs ⋈ store sigs (equi-join on modality/band/bucket) ──► candidates
  candidates ──exact verify──► new verified pairs  (appended)
  new profile rows appended to the store

``foreachBatch`` is the right tool here (not a stateful operator): the
signature store is a growing table, and the join/verify logic is exactly
the batch operators — streaming only schedules them incrementally.  State
lives in Parquet (store + pairs), so the stream is restartable from its
checkpoint directory; dedup semantics match a batch run over the union of
all micro-batches (pinned by tests/test_streaming.py).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..config import PipelineConfig
from ..operators.profile import (
    multimodal_profile,
    profile_signatures,
    verify_pairs_from_profile,
)


class IncrementalDedup:
    """Micro-batch incremental dedup over a streaming images DataFrame."""

    def __init__(self, spark: SparkSession, state_dir: str, cfg: PipelineConfig | None = None):
        self.spark = spark
        self.cfg = cfg or PipelineConfig()
        self.state_dir = state_dir
        self.store_path = os.path.join(state_dir, "profile_store")
        self.pairs_path = os.path.join(state_dir, "verified_pairs")
        os.makedirs(state_dir, exist_ok=True)

    def _store_exists(self) -> bool:
        return os.path.exists(os.path.join(self.store_path, "_SUCCESS"))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: profile the new rows, pair them against the
        store AND against each other, verify, append state."""
        cfg = self.cfg
        new_profile = multimodal_profile(
            batch_df.select("image_id", "caption", "phash"), cfg
        ).persist()
        if new_profile.count() == 0:
            new_profile.unpersist()
            return
        new_sigs = profile_signatures(new_profile, cfg)

        if self._store_exists():
            store_profile = self.spark.read.parquet(self.store_path)
            all_profile = store_profile.unionByName(new_profile)
            store_sigs = profile_signatures(store_profile, cfg)
            # new-vs-store (a from store or new, b always new) + new-vs-new.
            # The micro-batch side is explicitly broadcast: the growing
            # store then streams through the join with NO shuffle — the
            # per-batch cost is one store scan, not a store repartition.
            # (At cluster scale the next step is a bucket-partitioned
            # compacted store so the scan itself prunes; the scan-only
            # shape here is the prerequisite for that.)
            cross = (
                store_sigs.select("modality", "band", "bucket", F.col("image_id").alias("a"))
                .join(
                    F.broadcast(
                        new_sigs.select(
                            "modality", "band", "bucket", F.col("image_id").alias("b")
                        )
                    ),
                    ["modality", "band", "bucket"],
                )
                .filter(F.col("a") != F.col("b"))
                .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
            )
            intra = (
                new_sigs.select("modality", "band", "bucket", F.col("image_id").alias("a"))
                .join(
                    new_sigs.select(
                        "modality", "band", "bucket", F.col("image_id").alias("b")
                    ),
                    ["modality", "band", "bucket"],
                )
                .filter(F.col("a") < F.col("b"))
                .select("a", "b")
            )
            cands = cross.unionByName(intra).dropDuplicates(["a", "b"])
        else:
            all_profile = new_profile
            cands = (
                new_sigs.select("modality", "band", "bucket", F.col("image_id").alias("a"))
                .join(
                    new_sigs.select(
                        "modality", "band", "bucket", F.col("image_id").alias("b")
                    ),
                    ["modality", "band", "bucket"],
                )
                .filter(F.col("a") < F.col("b"))
                .select("a", "b")
            )

        pairs = verify_pairs_from_profile(cands, all_profile, cfg)
        pairs.write.mode("append").parquet(self.pairs_path)
        new_profile.write.mode("append").parquet(self.store_path)
        new_profile.unpersist()

    def start(self, stream_images: DataFrame, trigger_available_now: bool = True):
        """Attach to a streaming images DataFrame and run until the source
        is drained (availableNow) or indefinitely."""
        writer = (
            stream_images.writeStream.foreachBatch(self.process_batch)
            .option(
                "checkpointLocation", os.path.join(self.state_dir, "_checkpoint")
            )
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def verified_pairs(self) -> DataFrame:
        df = self.spark.read.parquet(self.pairs_path)
        return df.dropDuplicates(["a", "b"])

    def assignments(self) -> DataFrame:
        """Cluster the accumulated verified pairs (batch CC over state)."""
        from ..operators.cluster import assign_clusters

        profile = self.spark.read.parquet(self.store_path)
        return assign_clusters(profile, self.verified_pairs(), id_col="image_id")
