"""spark-submit entrypoint.

    spark-submit --py-files lsh_project_spark.zip -m lsh_project_spark.cli \
        --input /path/images_parquet --output /path/out \
        [--checkpoint-root /path/ckpt] [--metrics /path/metrics.json]

Reads the input_hint images table, runs the full dedup pipeline (optionally
checkpointed/resumable), writes (image_id, cluster_id) parquet, and dumps
stage metrics.  On a real cluster the session comes from spark-submit; in
the sandbox it falls back to a local session.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="lsh_project_spark")
    p.add_argument("--input", required=True, help="images parquet path")
    p.add_argument("--output", required=True, help="assignments parquet path")
    p.add_argument("--checkpoint-root", default=None, help="enable resumable stages")
    p.add_argument("--metrics", default=None, help="write metrics JSON here")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    existing = SparkSession.getActiveSession()
    if existing is not None:
        spark = existing
    else:
        from .session import get_spark

        spark = get_spark(app="lsh_project_spark.cli")

    from .config import PipelineConfig
    from .pipeline import dedup_pipeline

    cfg = PipelineConfig()
    images = spark.read.parquet(args.input)

    if args.checkpoint_root:
        from .checkpoint import checkpointed_dedup

        assignments = checkpointed_dedup(spark, images, args.checkpoint_root, cfg)
        assignments.write.mode("overwrite").parquet(args.output)
    else:
        res = dedup_pipeline(images, cfg)
        res.assignments.write.mode("overwrite").parquet(args.output)

    if args.metrics:
        from .metrics import cluster_stats

        out = spark.read.parquet(args.output)
        stats = {
            "config_hash": cfg.config_hash(),
            "rows": out.count(),
            "clusters": cluster_stats(out),
        }
        with open(args.metrics, "w") as f:
            json.dump(stats, f, indent=2, default=str)
    return 0


if __name__ == "__main__":
    sys.exit(main())
