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

    # batch ground truth — streaming covers the three SIGNATURE
    # modalities (CP-LSH/MinHash/SimHash); the substring pass is a
    # batch operator, so parity is pinned with it disabled
    cfg = PipelineConfig(substring_enabled=False)
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
    cfg = PipelineConfig(substring_enabled=False)
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

    # compaction: exactly one parquet file per partition dir in both stores
    for store in (inc.sig_store_path, inc.store_path):
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
