"""The JVM expression signature path (operators/signatures.py, used by the
DuckDB-checked queries) and the fused Arrow profile path
(operators/profile.py, used by the pipeline) must produce the SAME unified
signature table on the same rows."""

import pyspark.sql.functions as F

from lsh_project_spark.config import PipelineConfig
from lsh_project_spark.operators.profile import multimodal_profile, profile_signatures
from lsh_project_spark.pipeline import all_signatures
from lsh_project_spark.sources.fixtures import images_table


def test_unified_signature_tables_agree(spark):
    cfg = PipelineConfig()
    images = images_table(spark, num_clusters=12, seed=31).select(
        "image_id", "caption", "phash"
    ).cache()
    jvm = {
        (r["image_id"], r["modality"], r["band"], r["bucket"])
        for r in all_signatures(images, cfg).collect()
    }
    arrow = {
        (r["image_id"], r["modality"], r["band"], r["bucket"])
        for r in profile_signatures(multimodal_profile(images, cfg), cfg).collect()
    }
    assert jvm == arrow
