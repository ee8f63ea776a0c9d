"""Streaming sessionization via applyInPandasWithState — the custom
stateful-operator surface Structured Streaming exposes for logic a
built-in windowed aggregation can't express (variable-length sessions
defined by inactivity gaps).

Streaming twin of the batch sessionizer (plans/entry_queries.
q_event_sessions: lag + running sum over a user window).  Batch can sort
each user's full history; a stream cannot, so state per user holds the
OPEN sessions as (start, end, count) triples — never raw events, so state
is O(open sessions), not O(events):

- each micro-batch sessionizes vectorized (one sort + diff per user batch,
  no per-event Python), and the resulting triples coalesce into state via
  a linear interval-merge pass — an out-of-order arrival inside the
  watermark horizon can bridge two provisional sessions into one (counts
  add, boundaries take min/max, which is why boundaries+counts are
  sufficient state);
- a session is SEALED (emitted, removed from state) once
  ``end + gap < watermark``: every not-yet-seen event has
  ``ts >= watermark``, so nothing can extend or merge it any more;
- an event-time timeout at ``min(end) + gap`` seals idle users' sessions
  without waiting for their next event.

At 100 TB/day event volume this is the shape that scales: state per user
is a handful of triples, sealing is driven by the watermark exactly like
the built-in windowed aggregation, and the shuffle is the one hash
partition by user_id the groupBy already pays.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

GAP_SEC_DEFAULT = 1800

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, duration_sec long"
)
# open sessions, parallel arrays (epoch MICROSECONDS — integers, so Arrow
# round-trips are exact; float seconds would mis-align at ns resolution)
STATE_SCHEMA = "starts array<long>, ends array<long>, counts array<long>"


def _batch_triples(ts_us: "np.ndarray", gap: int) -> list[list[int]]:
    """Vectorized intra-batch sessionization: sorted epoch-us array ->
    (start, end, count) triples split where the inter-event gap exceeds
    ``gap``.  No per-event Python — one np.sort + np.diff per batch."""
    cut = np.nonzero(np.diff(ts_us) > gap)[0]
    lo = np.concatenate(([0], cut + 1))
    hi = np.concatenate((cut, [len(ts_us) - 1]))
    return [
        [int(ts_us[i]), int(ts_us[j]), int(j - i + 1)]
        for i, j in zip(lo, hi)
    ]


def _coalesce(triples: list[list[int]], gap: int) -> list[list[int]]:
    """Merge (start, end, count) triples whose gap-tolerant intervals
    touch (same-session rule: diff <= gap).  A linear pass over the
    sorted list handles transitive bridges — an out-of-order batch triple
    that touches two state sessions merges the whole chain."""
    out: list[list[int]] = []
    for s, e, c in sorted(triples):
        if out and s <= out[-1][1] + gap:
            out[-1][1] = max(out[-1][1], e)
            out[-1][2] += c
        else:
            out.append([s, e, c])
    return out


def make_session_fn(gap_sec: float = GAP_SEC_DEFAULT):
    """Build the applyInPandasWithState function (gap baked in — the
    function signature Spark calls has no config slot)."""

    gap_us = int(gap_sec * 1_000_000)

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            starts, ends, counts = state.get
            sessions = [
                [int(s), int(e), int(c)]
                for s, e, c in zip(starts, ends, counts)
            ]
        else:
            sessions = []
        if not state.hasTimedOut:
            new_triples: list[list[int]] = []
            for pdf in pdfs:
                if not len(pdf):
                    continue
                # datetime64[ns] -> exact epoch us
                ts_us = np.sort(pdf["ts"].astype("int64").to_numpy() // 1000)
                new_triples += _batch_triples(ts_us, gap_us)
            if new_triples:
                sessions = _coalesce(sessions + new_triples, gap_us)
        wm_us = state.getCurrentWatermarkMs() * 1000
        sealed = [x for x in sessions if x[1] + gap_us < wm_us]
        sessions = [x for x in sessions if x[1] + gap_us >= wm_us]
        if sessions:
            state.update((
                [x[0] for x in sessions],
                [x[1] for x in sessions],
                [x[2] for x in sessions],
            ))
            # seal idle sessions when the watermark passes end + gap (must
            # be strictly beyond the current watermark or Spark rejects it)
            timeout_ms = min(x[1] + gap_us for x in sessions) // 1000
            state.setTimeoutTimestamp(
                max(timeout_ms, state.getCurrentWatermarkMs() + 1)
            )
        else:
            state.remove()
        if sealed:
            # duration matches the batch twin: unix_timestamp() floors to
            # seconds BEFORE differencing
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(sealed),
                    "session_start": pd.to_datetime(
                        [x[0] for x in sealed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [x[1] for x in sealed], unit="us"
                    ),
                    "n_events": [x[2] for x in sealed],
                    "duration_sec": [
                        x[1] // 1_000_000 - x[0] // 1_000_000 for x in sealed
                    ],
                }
            )

    return fn


def sessionize(
    events,
    gap_sec: float = GAP_SEC_DEFAULT,
    watermark: str = "2 hours",
    ts_col: str = "ts",
):
    """Watermarked stateful sessionization of a STREAMING events DataFrame:
    (user_id, session_start, session_end, n_events, duration_sec), one row
    per sealed session."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_sec),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def run_sessionize_stream(
    spark,
    events_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    gap_sec: float = GAP_SEC_DEFAULT,
    watermark: str = "2 hours",
):
    """Drain ``events_dir`` (parquet file source) through ``sessionize``
    into a parquet sink (restart-safe, unlike the memory sink) and return
    the finished query; sealed sessions land in ``out_dir``."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    q = (
        sessionize(stream, gap_sec=gap_sec, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
