"""Round-7 optimization probe: per-query wall times (noop sink) + formatted
plans, WITHOUT touching the frozen bench.py.

Usage:
  python scripts/probe_r07.py before q1 q2 ...     # times + plans/r07/<q>_before.txt
  python scripts/probe_r07.py after  q1 q2 ...     # times + plans/r07/<q>_after.txt
  python scripts/probe_r07.py none   q1 q2 ...     # times only (no plan files)

Special names beyond entry queries: dedup_e2e (full pipeline on the bench
images table), substring_modality, profile_stage, candidates_stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("PROBE_REPS", "2"))
TILES = int(os.environ.get("SPARK_GRAFT_BENCH_TILES", "10"))
IMAGES_PATH = (
    f"/tmp/bench_images_{SF_DIR.strip('/').replace('/', '_')}_x{TILES}.parquet"
)


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    from lsh_project_spark.session import get_spark
    from lsh_project_spark.plans import entry_queries
    import __spark_entry__ as E

    spark = get_spark(app=f"probe_r07", cores=CPUS, shuffle_partitions=max(8, CPUS * 8))
    qs = E.queries()
    out = {}
    for name in names:
        df_fn = None
        if name in qs:
            df_fn = lambda n=name: qs[n](spark, SF_DIR)
        elif name == "dedup_e2e":
            from lsh_project_spark.config import PipelineConfig
            from lsh_project_spark.pipeline import dedup_pipeline

            images = spark.read.parquet(IMAGES_PATH)
            df_fn = lambda: dedup_pipeline(images, PipelineConfig()).assignments
        elif name == "dedup_e2e_sigs_only":
            from lsh_project_spark.config import PipelineConfig
            from lsh_project_spark.pipeline import dedup_pipeline

            images = spark.read.parquet(IMAGES_PATH)
            df_fn = lambda: dedup_pipeline(
                images, PipelineConfig(substring_enabled=False)
            ).assignments
        elif name == "substring_modality":
            import pyspark.sql.functions as F
            from lsh_project_spark.config import PipelineConfig
            from lsh_project_spark.operators.substring import substring_pairs

            images = spark.read.parquet(IMAGES_PATH)
            cfg = PipelineConfig()
            slim = images.select(
                F.xxhash64("image_id").alias("image_id"), "caption", "phash"
            )
            df_fn = lambda: substring_pairs(
                slim.select("image_id", F.col("caption").alias("text")),
                cfg.substring, id_col="image_id", text_col="text",
            )
        else:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        runs = []
        for r in range(REPS):
            entry_queries.reset_gate_caches()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"probe:{name}:{r}")
            t0 = time.time()
            df = df_fn()
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.time() - t0, 2))
        if tag != "none":
            entry_queries.reset_gate_caches()
            df2 = df_fn()
            plan = df2._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(f"plans/r07/{name}_{tag}.txt", "w") as f:
                f.write(plan)
        out[name] = runs
        print(json.dumps({name: runs}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
