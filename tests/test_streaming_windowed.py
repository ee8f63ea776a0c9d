"""Watermarked windowed streaming aggregation: streamed == batch on the
same files, and late data beyond the watermark horizon is dropped with
per-batch accounting (numRowsDroppedByWatermark)."""

import os
from datetime import datetime, timedelta

from lsh_project_spark.streaming.windowed import (
    run_events_stream,
    windowed_event_counts,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _canon(df):
    return sorted(
        (str(r["hour"]), r["event_type"], r["n_events"], r["sum_value"])
        for r in df.collect()
    )


def test_streamed_equals_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    # batch twin: the same transformation applied eagerly
    want = _canon(windowed_event_counts(events))

    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    q = run_events_stream(
        spark, src, str(tmp_path / "ckpt"), sink_table="hw_counts"
    )
    got = _canon(spark.table("hw_counts"))
    assert got == want
    assert len(got) > 0


def test_late_rows_dropped_by_watermark(spark, tmp_path):
    """Two availableNow drains over a growing directory: run 1 advances the
    watermark past hour H; run 2 adds an event in hour H-3 (beyond the
    2-hour horizon) plus a fresh one.  The stateful operator reports the
    late row dropped, and it never reaches the sink."""
    src = tmp_path / "late_src"
    ckpt = str(tmp_path / "late_ckpt")
    base = datetime(2026, 1, 1, 12, 0, 0)
    cols = "event_id long, ts timestamp, event_type string, value double"

    def write_file(rows):
        spark.createDataFrame(rows, cols).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    write_file(
        [(1, base, "click", 1.0), (2, base + timedelta(hours=1), "click", 1.0)]
    )
    q1 = run_events_stream(
        spark, str(src), ckpt, output_mode="append", sink_format="noop"
    )
    # watermark committed after run 1: max(ts) - 2h = 11:00
    write_file(
        [
            (3, base - timedelta(hours=3), "late", 9.0),  # 09:00 < watermark
            (4, base + timedelta(hours=2), "click", 1.0),
        ],
    )
    q2 = run_events_stream(
        spark, str(src), ckpt, output_mode="append", sink_format="noop"
    )
    # the drop happens in run 2's first (data) batch; the availableNow
    # drain appends a trailing no-data batch to commit the advanced
    # watermark, so sum over recentProgress, not lastProgress
    dropped = sum(
        op["numRowsDroppedByWatermark"]
        for p in q2.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped >= 1, [p.get("stateOperators") for p in q2.recentProgress]
