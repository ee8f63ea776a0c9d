"""applyInPandasWithState sessionization: out-of-order bridge events merge
provisional sessions across micro-batch drains, and sealed streamed
sessions equal the batch sessionizer on the same files."""

import os
from datetime import datetime, timedelta

import pyspark.sql.functions as F

from lsh_project_spark.streaming.sessions import run_sessionize_stream

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_bridge_event_merges_sessions(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    base = datetime(2026, 1, 1, 10, 0, 0)
    cols = "event_id long, ts timestamp, user_id long, event_type string"

    def wf(rows):
        spark.createDataFrame(rows, cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # run 1: user 1 has two provisional sessions (10:00, 11:00 — gap 60 min
    # > 30 min); user 2 one singleton
    wf([
        (1, base, 1, "a"),
        (2, base + timedelta(hours=1), 1, "a"),
        (3, base, 2, "b"),
    ])
    run_sessionize_stream(spark, src, ckpt, out)
    # run 2: a 10:30 bridge event arrives out of order (>= watermark 09:00)
    # and merges user 1's sessions; a 20:00 pusher advances the final
    # watermark to 18:00, sealing everything older
    wf([
        (4, base + timedelta(minutes=30), 1, "a"),
        (5, base + timedelta(hours=10), 99, "c"),
    ])
    run_sessionize_stream(spark, src, ckpt, out)

    rows = {
        (r["user_id"], str(r["session_start"]), r["n_events"],
         r["duration_sec"])
        for r in spark.read.parquet(out).collect()
    }
    assert (1, "2026-01-01 10:00:00", 3, 3600) in rows, rows
    assert (2, "2026-01-01 10:00:00", 1, 0) in rows
    # user 99's session (20:00) is still open at watermark 18:00
    assert not any(r[0] == 99 for r in rows)
    assert len(rows) == 2


def test_sealed_sessions_equal_batch(spark, tmp_path):
    """One availableNow drain of the real events table: every session the
    stream seals must match the batch sessionizer bit-for-bit, and the
    sealed set must be exactly the batch sessions old enough to seal
    (end + gap < final watermark)."""
    events = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id",
        "event_type",
    )
    src = str(tmp_path / "src")
    events.write.parquet(src)
    run_sessionize_stream(
        spark, src, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    got = {
        (r["user_id"], r["start_s"], r["end_s"], r["n_events"])
        for r in spark.read.parquet(str(tmp_path / "out")).select(
            "user_id",
            F.unix_timestamp("session_start").alias("start_s"),
            F.unix_timestamp("session_end").alias("end_s"),
            "n_events",
        ).collect()
    }

    # batch twin: lag + running-sum sessionizer (q_event_sessions shape)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            F.expr(
                "case when prev_ts is null or (unix_timestamp(ts) - "
                "unix_timestamp(prev_ts)) > 1800 then 1 else 0 end"
            ),
        )
        .withColumn("session_idx", F.sum("new_session").over(w))
        .groupBy("user_id", "session_idx")
        .agg(
            F.unix_timestamp(F.min("ts")).alias("start_s"),
            F.unix_timestamp(F.max("ts")).alias("end_s"),
            F.count("*").alias("n_events"),
        )
    )
    wm = events.agg(
        F.unix_timestamp(F.max("ts")).alias("m")
    ).collect()[0]["m"] - 7200
    want = {
        (r["user_id"], r["start_s"], r["end_s"], r["n_events"])
        for r in sess.filter(F.col("end_s") + 1800 < F.lit(wm)).collect()
    }
    assert len(want) > 0
    assert got == want


def test_coalesce_matches_per_event_reference():
    """Property: vectorized batch-triples + interval coalesce equals a
    per-event insertion reference, for random event sets split into random
    'state'/'batch' halves."""
    import numpy as np

    from lsh_project_spark.streaming.sessions import (
        _batch_triples,
        _coalesce,
    )

    rng = np.random.Generator(np.random.PCG64(7))
    gap = 1_800_000_000  # 30 min in us
    for trial in range(200):
        n = int(rng.integers(1, 40))
        ts = np.sort(rng.integers(0, 40 * gap, size=n))
        cut = int(rng.integers(0, n + 1))
        state_ts, batch_ts = ts[:cut], ts[cut:]
        # reference: sessionize the FULL multiset in one pass
        want = _batch_triples(np.sort(ts), gap)
        # incremental: state triples + batch triples -> coalesce
        triples = []
        if len(state_ts):
            triples += _batch_triples(state_ts, gap)
        if len(batch_ts):
            triples += _batch_triples(np.sort(batch_ts), gap)
        got = _coalesce(triples, gap)
        assert got == want, (trial, ts.tolist())
