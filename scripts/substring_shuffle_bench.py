"""Substring verify shuffle microbench (round-4 evidence).

Round 3's verify joined BOTH full texts onto every candidate pair, so a
document with d duplicate partners shipped d times through the verify
shuffle.  The grid-cell cogroup (operators/substring.py) ships each needed
(cell, doc) once — at most 2G-1 copies per doc regardless of d.

This script builds the adversarial case (a CLIQUE of 10 KB documents
sharing a 2 KB block -> d = CLIQUE-1 partners each), runs BOTH layouts with
broadcast joins disabled (modelling at-scale where texts cannot broadcast),
and reports the verify-stage shuffle bytes from the Spark event log.
Writes BENCH/SUBSTRING_SHUFFLE.md.  Usage: python scripts/substring_shuffle_bench.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVENT_DIR = "/tmp/spark-events-substr"
CLIQUE = 256
N_SINGLE = 64
GRID = 4  # 2G-1 = 7 text copies/doc; cells stay far below executor memory here
DOC_KB = 8
SHARED_KB = 2


def _mk_docs(spark):
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(99))
    words = [f"w{i:04d}" for i in range(5000)]

    def blob(n_chars: int) -> str:
        toks = []
        size = 0
        while size < n_chars:
            w = words[int(rng.integers(0, len(words)))]
            toks.append(w)
            size += len(w) + 1
        return " ".join(toks)

    shared = blob(SHARED_KB * 1024)
    rows = [(i, blob(DOC_KB * 1024) + " " + shared) for i in range(CLIQUE)]
    rows += [
        (CLIQUE + i, blob((DOC_KB + SHARED_KB) * 1024))
        for i in range(N_SINGLE)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shuffle_bytes(app_id: str, t0_ms: float) -> int:
    total = 0
    for d in glob.glob(os.path.join(EVENT_DIR, f"*{app_id}*")):
        files = (
            sorted(glob.glob(os.path.join(d, "events_*")))
            if os.path.isdir(d) else [d]
        )
        for path in files:
            with open(path) as f:
                for line in f:
                    if '"SparkListenerTaskEnd"' not in line:
                        continue
                    ev = json.loads(line)
                    if ev.get("Task Info", {}).get("Finish Time", 0) < t0_ms:
                        continue
                    sw = (ev.get("Task Metrics") or {}).get(
                        "Shuffle Write Metrics"
                    ) or {}
                    total += sw.get("Shuffle Bytes Written", 0)
    return total


def _naive_pairs(docs, cfg, hot):
    """The round-3 layout, reconstructed for comparison: per-pair text join
    then mapInPandas verify."""
    import pandas as pd
    import numpy as np
    import pyspark.sql.functions as F

    from lsh_project_spark.operators.candidates import candidate_pairs
    from lsh_project_spark.operators.substring import (
        lcs_len_via_diagonal_runs,
        winnowed_fingerprints,
    )

    fps = winnowed_fingerprints(docs, cfg, "doc_id", "text")
    cands = candidate_pairs(
        fps, id_col="doc_id", bucket_cols=("fp",), hot_bucket_threshold=hot
    )
    side = docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_t"))
    joined = cands.join(
        side.withColumnRenamed("_id", "a").withColumnRenamed("_t", "ta"), "a"
    ).join(side.withColumnRenamed("_id", "b").withColumnRenamed("_t", "tb"), "b")
    min_len = cfg.min_length

    def verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            lens = [
                lcs_len_via_diagonal_runs(ta, tb, min_len)
                for ta, tb in zip(pdf["ta"], pdf["tb"])
            ]
            out = pdf[["a", "b"]].copy()
            out["lcs_len"] = np.array(lens, dtype=np.int64)
            yield out[out["lcs_len"] >= min_len]

    return joined.mapInPandas(verify, schema="a long, b long, lcs_len long")


def run(variant: str) -> dict:
    from lsh_project_spark.config import SubstringConfig
    from lsh_project_spark.operators.substring import substring_pairs
    from lsh_project_spark.session import get_spark

    os.makedirs(EVENT_DIR, exist_ok=True)
    spark = get_spark(
        app=f"substr_{variant}", cores=8, shuffle_partitions=16,
        extra={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVENT_DIR}",
            "spark.eventLog.compress": "false",
            # at 100 TB the text side cannot broadcast; model that here
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = _mk_docs(spark).repartition(8).persist()
    docs.count()
    cfg = SubstringConfig()
    hot = 2000  # keep the full 128-clique (the adversarial d) as real pairs
    t0 = time.time()
    if variant == "grid":
        n = substring_pairs(docs, cfg, hot_threshold=hot, grid=GRID).count()
    elif variant == "cands":
        from lsh_project_spark.operators.candidates import candidate_pairs
        from lsh_project_spark.operators.substring import winnowed_fingerprints

        n = candidate_pairs(
            winnowed_fingerprints(docs, cfg, "doc_id", "text"),
            id_col="doc_id", bucket_cols=("fp",), hot_bucket_threshold=hot,
        ).count()
    else:
        n = _naive_pairs(docs, cfg, hot).count()
    wall = time.time() - t0
    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1)
    return {
        "pairs": n,
        "wall_sec": round(wall, 1),
        "shuffle_bytes": _shuffle_bytes(app_id, t0 * 1000),
    }


def main() -> None:
    # the winnow -> salted-candidates prefix is identical in both layouts;
    # measure it once and subtract, so the ratio isolates the VERIFY stage
    base = run("cands")["shuffle_bytes"]
    grid = run("grid")
    naive = run("naive")
    gv = max(grid["shuffle_bytes"] - base, 1)
    nv = max(naive["shuffle_bytes"] - base, 1)
    grid["verify_shuffle_bytes"], naive["verify_shuffle_bytes"] = gv, nv
    ratio = nv / gv
    out = {"candidate_stage_bytes": base, "grid": grid, "naive_r3": naive,
           "verify_shuffle_reduction_x": round(ratio, 2)}
    print(json.dumps(out))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SUBSTRING_SHUFFLE.md"), "w") as f:
        f.write(f"""# Substring verify shuffle — grid cogroup vs per-pair text join

Adversarial layout: {CLIQUE} documents of ~{DOC_KB + SHARED_KB} KB sharing a
{SHARED_KB} KB block (so each has d = {CLIQUE - 1} duplicate partners), plus
{N_SINGLE} singleton docs; broadcast joins disabled to model at-scale text
sizes.  Produced by `scripts/substring_shuffle_bench.py`.

| layout | verified pairs | wall (s) | total shuffle bytes | verify-stage bytes |
|---|---|---|---|---|
| grid cogroup (round 4) | {grid['pairs']} | {grid['wall_sec']} | {grid['shuffle_bytes']:,} | {grid['verify_shuffle_bytes']:,} |
| per-pair text join (round 3) | {naive['pairs']} | {naive['wall_sec']} | {naive['shuffle_bytes']:,} | {naive['verify_shuffle_bytes']:,} |

Verify-stage bytes = total minus the winnow->candidates prefix
({out['candidate_stage_bytes']:,} B), which is identical in both layouts.

**verify shuffle reduction: {ratio:.1f}x** (G = {GRID}: each document ships
to at most 2G-1 = {2 * GRID - 1} grid cells instead of once per candidate
pair; its g-gram hash array is computed once per cell instead of once per
pair.  G trades per-doc copies against per-cell memory — at 100 TB pick G
so a cell's documents fit one executor).
""")


if __name__ == "__main__":
    main()
