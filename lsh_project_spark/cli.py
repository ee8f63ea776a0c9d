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
    p.add_argument(
        "--no-substring", action="store_true",
        help="skip the suffix-array substring modality (signature LSH only)",
    )
    p.add_argument(
        "--snapshot-root", default=None,
        help="commit assignments as a new snapshot of this versioned table "
        "(time-travelable; see table.SnapshotTable) in addition to "
        "--output, which is then copied from the committed snapshot "
        "without re-running the pipeline",
    )
    p.add_argument(
        "--snapshot-keep-last", type=int, default=None, metavar="N",
        help="after committing, expire all but the newest N snapshots and "
        "sweep orphaned data dirs / spent commit claims "
        "(table maintenance; requires --snapshot-root)",
    )
    args = p.parse_args(argv)
    if args.snapshot_keep_last is not None and not args.snapshot_root:
        p.error("--snapshot-keep-last requires --snapshot-root")

    from pyspark.sql import SparkSession

    existing = SparkSession.getActiveSession()
    if existing is not None:
        spark = existing
    else:
        from .session import get_spark

        spark = get_spark(app="lsh_project_spark.cli")

    from .config import PipelineConfig
    from .pipeline import dedup_pipeline

    cfg = PipelineConfig(substring_enabled=not args.no_substring)
    images = spark.read.parquet(args.input)

    drop_stats_df = None
    if args.checkpoint_root:
        from .checkpoint import checkpointed_dedup

        # drop accounting rides in the candidates stage manifest here
        assignments = checkpointed_dedup(spark, images, args.checkpoint_root, cfg)
    else:
        res = dedup_pipeline(images, cfg)
        assignments = res.assignments
        drop_stats_df = res.drop_stats
    if args.snapshot_root:
        from .table import SnapshotTable

        table = SnapshotTable(spark, args.snapshot_root)
        table.commit(assignments, note=f"cli input={args.input}")
        if args.snapshot_keep_last is not None:
            table.expire_snapshots(keep_last=args.snapshot_keep_last)
            table.remove_orphans()
        # --output is served from the committed snapshot: the pipeline DAG
        # executed once for the commit; re-writing `assignments` here
        # would re-execute it end to end
        table.read().write.mode("overwrite").parquet(args.output)
    else:
        assignments.write.mode("overwrite").parquet(args.output)

    if args.metrics:
        from .metrics import cluster_stats

        out = spark.read.parquet(args.output)
        stats = {
            "config_hash": cfg.config_hash(),
            "rows": out.count(),
            "clusters": cluster_stats(out),
        }
        if drop_stats_df is not None:
            stats["hot_drop_stats"] = {
                f"hot_{k}": int(v)
                for k, v in drop_stats_df.collect()[0].asDict().items()
            }
        with open(args.metrics, "w") as f:
            json.dump(stats, f, indent=2, default=str)
    return 0


if __name__ == "__main__":
    sys.exit(main())
