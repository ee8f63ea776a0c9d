"""Incremental streaming dedup == batch dedup over the same rows."""

import pyspark.sql.functions as F
import pytest

from lsh_project_spark.config import PipelineConfig
from lsh_project_spark.pipeline import dedup_pipeline
from lsh_project_spark.sources.fixtures import images_table
from lsh_project_spark.streaming.incremental import IncrementalDedup


def test_streaming_matches_batch(spark, tmp_path):
    images = images_table(spark, num_clusters=15, seed=23).cache()
    images.count()

    # batch ground truth: ALL FOUR modalities, substring included —
    # streaming's fp/caption stores must reproduce the batch OR-union
    cfg = PipelineConfig()
    batch_pairs = {
        (r["a"], r["b"])
        for r in dedup_pipeline(images, cfg).verified_pairs.collect()
    }

    # stream the same rows in two file micro-batches
    src = str(tmp_path / "stream_src")
    images.filter(F.expr("pmod(phash, 2) = 0")).write.parquet(f"{src}/b0")
    images.filter(F.expr("pmod(phash, 2) != 0")).write.parquet(f"{src}/b1")
    schema = spark.read.parquet(f"{src}/b0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(f"{src}/b*")
    )

    inc = IncrementalDedup(spark, str(tmp_path / "state"), cfg)
    q = inc.start(stream, trigger_available_now=True)
    q.awaitTermination(300)

    stream_pairs = {(r["a"], r["b"]) for r in inc.verified_pairs().collect()}
    assert stream_pairs == batch_pairs

    # clustering over streamed state matches batch assignments
    batch_asg = {
        (r["image_id"], r["cluster_id"])
        for r in dedup_pipeline(images, cfg).assignments.collect()
    }
    stream_asg = {
        (r["image_id"], r["cluster_id"]) for r in inc.assignments().collect()
    }
    assert stream_asg == batch_asg


def test_streaming_many_batches_with_compaction(spark, tmp_path):
    """10 micro-batches through the partitioned stores with compaction every
    4 batches: results still match the batch pipeline, and compaction leaves
    one file per store partition (bounded per-batch planning cost)."""
    import glob
    import os

    images = images_table(spark, num_clusters=12, seed=31).cache()
    images.count()
    cfg = PipelineConfig()
    batch_pairs = {
        (r["a"], r["b"])
        for r in dedup_pipeline(images, cfg).verified_pairs.collect()
    }

    inc = IncrementalDedup(
        spark, str(tmp_path / "state"), cfg, num_store_partitions=8,
        compact_every=4,
    )
    # drive foreachBatch directly: 10 deterministic slices
    for b in range(10):
        inc.process_batch(images.filter(F.expr(f"pmod(phash, 10) = {b}")), b)
    inc.compact()

    stream_pairs = {(r["a"], r["b"]) for r in inc.verified_pairs().collect()}
    assert stream_pairs == batch_pairs

    # compaction: exactly one parquet file per partition dir in all stores
    for store in (inc.sig_store_path, inc.store_path, inc.fp_store_path,
                  inc.caption_store_path):
        part_dirs = [d for d in glob.glob(os.path.join(store, "*=*"))]
        assert part_dirs, store
        for d in part_dirs:
            files = [f for f in os.listdir(d) if f.endswith(".parquet")]
            assert len(files) == 1, (d, files)

    # store reads for a batch are partition-pruned (exact: equal bucket
    # keys imply equal pbucket partition)
    hit = [0, 3]
    plan = (
        spark.read.parquet(inc.sig_store_path)
        .filter(F.col("pbucket").isin(hit))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "pbucket" in plan


def test_streaming_hot_bucket_micro_batch(spark, tmp_path):
    """A degenerate micro-batch (hundreds of rows colliding in one bucket)
    must go through the salted hot-bucket star defense, not a quadratic
    self-join: candidate edges stay O(n) per hot bucket while the batch's
    rows still land in ONE cluster (round-4: intra-batch candidates route
    through candidate_pairs)."""
    import numpy as np
    import pandas as pd

    from lsh_project_spark.sources.fixtures import IMAGES_SCHEMA

    # identical caption + identical phash -> every signature modality puts
    # all n rows in the same buckets; n >> hot_bucket_threshold (32)
    n = 300
    rows = pd.DataFrame(
        {
            "image_id": [f"hot{i:04d}" for i in range(n)],
            "bytes": [None] * n,
            "w": np.int32(8),
            "h": np.int32(8),
            "fmt": "png",
            "caption": "the very same caption text for every row here",
            "phash": np.int64(123456789),
            "true_cluster_id": np.int64(1),
        }
    )
    images = spark.createDataFrame(rows, IMAGES_SCHEMA)
    cfg = PipelineConfig(substring_enabled=False)
    inc = IncrementalDedup(spark, str(tmp_path / "state"), cfg)
    inc.process_batch(images, 0)

    pairs = inc.verified_pairs()
    n_pairs = pairs.count()
    # star defense: linear in n, nowhere near the C(n,2) = 44,850 of a raw
    # self-join (chained star emits <= n-1 edges per bucket; pair dedup
    # across modalities keeps the union small)
    assert n_pairs < 5 * n, n_pairs
    # ...but connectivity survives: all rows in one cluster
    asg = inc.assignments()
    assert asg.select("cluster_id").distinct().count() == 1
    assert asg.count() == n
