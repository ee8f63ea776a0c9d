"""Watermarked windowed aggregation over the events stream — the native
Structured Streaming idiom (readStream -> watermark -> window -> agg),
complementing the foreachBatch incremental dedup in incremental.py.

The transformation is declared ONCE and applied to either a batch or a
streaming events DataFrame: Catalyst plans the batch case as an ordinary
hash aggregate and the streaming case as a stateful windowed aggregation
whose state is evicted by the watermark.  At 100 TB/day event volumes this
is the operator shape that matters: state size is bounded by (windows
inside the watermark horizon) x (event_type cardinality), not by stream
length, and late events beyond the horizon are dropped (observable per
micro-batch via StreamingQueryProgress.stateOperators[*]
.numRowsDroppedByWatermark) instead of growing state forever.

Batch twin: plans/entry_queries.q_events_hourly computes the same hourly
rollup eagerly; tests pin streamed(complete) == batch on the same files.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type with a late-data
    watermark.  Works on both batch and streaming inputs (watermark is a
    no-op in batch plans)."""
    # event-time watermarks require TIMESTAMP_LTZ; the events table ships
    # TIMESTAMP_NTZ — cast (session TZ) identically in batch and streaming
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("win"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.expr("round(sum(value), 4)").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_events_stream(
    spark,
    events_dir: str,
    checkpoint_dir: str,
    sink_table: str = "hourly_counts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    output_mode: str = "complete",
    max_files_per_trigger: int | None = None,
    sink_format: str = "memory",
):
    """File-source streaming twin of q_events_hourly: read ``events_dir``
    as a parquet stream, aggregate with ``windowed_event_counts``, drain
    with availableNow, and return the finished StreamingQuery.

    ``sink_format="memory"`` exposes results as ``spark.table(sink_table)``
    (first run only — the memory sink cannot recover from a checkpoint);
    ``sink_format="noop"`` supports re-draining a growing directory from
    the same checkpoint, with watermark/late-drop accounting read from
    ``lastProgress.stateOperators`` (numRowsDroppedByWatermark)."""
    schema = spark.read.parquet(events_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)
    agg = windowed_event_counts(stream, window=window, watermark=watermark)
    writer = agg.writeStream.format(sink_format)
    if sink_format == "memory":
        writer = writer.queryName(sink_table)
    q = (
        writer.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
