"""SparkSession builder with the engine's scale-oriented defaults.

Tuned for the sandbox (local[N], single JVM) but every knob is the one
you'd set on a 1000-executor cluster: AQE on (runtime partition coalescing
+ skew-join splitting), Arrow-vectorized Python exchange, explicit shuffle
partitions scaled with parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "lsh_project_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(8, cores * 8)
    # One BLAS thread per Python worker: task-level parallelism already
    # saturates the cores, and N workers x N-thread BLAS oversubscribes
    # N^2 threads — measured 5-20x slowdown on the small per-batch matvecs
    # the signature/fingerprint stages run.  Same setting a real cluster
    # ships via spark.executorEnv.*.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce post-shuffle partitions to data size, not to raw core
        # count — tiny stages collapse to a handful of tasks, huge stages
        # keep shuffle_partitions; without this every micro-shuffle pays
        # `shuffle_partitions` task launches
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
        # let AQE re-plan cached DataFrames too (candidate_pairs persists
        # the signature table; default false pins its partitioning)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # signature matmul batches: large enough to amortize Arrow transfer,
        # small enough that batch x d floats stay cache/memory friendly
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
