"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship near-duplicate dedup+clustering slice on
                 /root/testdata/sf0.001 (images derived deterministically
                 from the documents table; full pipeline: featurize ->
                 CP-LSH + MinHash + SimHash -> candidate pairs -> exact
                 verify -> connected components).
queries()      — operators from SURVEY.md §2 / §2.9 on the driver tables.
oracle_sql()   — DuckDB-checkable ANSI SQL twins of each query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: end-to-end dedup on sf0.001 -> (image_id, cluster_id)."""
    from lsh_project_spark.config import PipelineConfig
    from lsh_project_spark.pipeline import dedup_pipeline
    from lsh_project_spark.sources.fixtures import images_from_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    images = images_from_documents(docs, seed=42)
    return dedup_pipeline(images, PipelineConfig()).assignments


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lsh_project_spark.plans.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from lsh_project_spark.plans import entry_queries

    return entry_queries.oracle_sql()
