"""Structured-Streaming analytics over the event stream: watermarked
windowed aggregation and custom stateful sessionization.

The CDC apply path (pipeline.py) uses foreachBatch because its sink is
transactional; these operators cover the OTHER streaming shapes the
engine needs for the analytics side of an ingest platform:

* ``hourly_counts_stream`` — readStream -> withWatermark -> window agg.
  Late events beyond the watermark are dropped deterministically; state
  is bounded by (watermark horizon / window) regardless of stream length
  — the 10^10-event requirement for any continuous aggregation.
* ``sessionize_stream`` — applyInPandasWithState: per-user session
  windows with an inactivity gap, emitted when the watermark passes the
  session end + gap. State per key is one (start, end, count) triple —
  O(active users), not O(events).

Both run with ``availableNow`` for bounded drains (tests/bench) or
continuously; sinks are caller-chosen (memory/parquet/foreachBatch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), True),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("value", T.DoubleType(), True),
])


def write_time_ordered_stream(spark: SparkSession, src: DataFrame,
                              out_dir: str, n_chunks: int = 4,
                              ts_col: str = "ts") -> None:
    """Materialize a DataFrame as a directory of event-time-ordered
    chunks for the file-stream source. Spark's FileStreamSource batches
    files by MODIFICATION time, not name — a single parallel write gives
    all parts one mtime and arbitrary arrival order, so older rows can
    land after the watermark passed them and be dropped as late. Real
    feeds (binlog, Kafka) arrive in time order; we emulate that by
    writing the chunks sequentially (ascending mtimes)."""
    import time as _time

    bounds = src.select(
        *[F.percentile_approx(ts_col, i / n_chunks, 10_000).alias(f"q{i}")
          for i in range(1, n_chunks)]
    ).head()
    if bounds is None:          # empty source: one empty chunk, no split
        src.coalesce(1).write.mode("append").parquet(out_dir)
        return
    edges = [bounds[f"q{i}"] for i in range(1, n_chunks)]
    if all(e is None for e in edges):
        # non-empty source with an all-null ts column: every edge is
        # None, so no chunk filter would apply and each of the n_chunks
        # appends would duplicate the FULL row set — take the
        # single-chunk path instead (order is vacuous without ts).
        src.coalesce(1).write.mode("append").parquet(out_dir)
        return
    lo = None
    for i in range(n_chunks):
        hi = edges[i] if i < len(edges) else None
        part = src
        if lo is not None:
            part = part.filter(F.col(ts_col) > lo)
        if hi is not None:
            cond = F.col(ts_col) <= hi
            if lo is None:
                # null-ts rows fail every range predicate; ride the
                # FIRST chunk so chunking never changes the row set
                cond = cond | F.col(ts_col).isNull()
            part = part.filter(cond)
        part.coalesce(1).write.mode("append").parquet(out_dir)
        _time.sleep(1.1)  # distinct mtimes (FileStreamSource granularity)
        lo = hi


def read_events_stream(spark: SparkSession, events_dir: str,
                       max_files_per_trigger: int = 4,
                       schema: T.StructType = EVENTS_SCHEMA) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )


def hourly_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation (append mode): one row per
    (hour, event_type) finalized once the watermark passes the window
    end. State is bounded by the watermark horizon — late data inside it
    updates the window, beyond it is dropped (counted by Spark's
    numDroppedRows metric)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total_value")
    )


SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("session_start", T.TimestampType(), True),
    T.StructField("session_end", T.TimestampType(), True),
    T.StructField("n_events", T.LongType(), True),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType(), True),
    T.StructField("end_us", T.LongType(), True),
    T.StructField("n", T.LongType(), True),
])


def _sessionize_fn(gap_sec: int):
    gap_us = gap_sec * 1_000_000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        # state keeps MICROSECONDS (full timestamp precision round-trips)
        import numpy as np

        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame({
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
            })
            return
        # VECTORIZED session split (r3 directive #7 — no per-event Python
        # loop; a Zipf-hot user's batch slice is group math, not rows):
        # with ts sorted ascending, the running session end at index i is
        # max(carried_end, ts[i-1]) — after any split the carried_end is
        # strictly below every later ts, so the maximum is exact without
        # knowing the split points. A session boundary is then simply
        # ts - that_running_end > gap, and sessions are the cumsum
        # segments between boundaries.
        arrs = [pd.to_datetime(pdf["ts"]).values.astype("datetime64[us]")
                .astype(np.int64) for pdf in pdfs]
        ts = np.sort(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)
        if ts.size == 0:
            if state.exists:
                start_us, end_us, n = state.get
                state.update((start_us, end_us, n))
                state.setTimeoutTimestamp((end_us + gap_us) // 1000 + 1)
            return
        if state.exists:
            start_us, end_us, n0 = state.get
        else:
            start_us, end_us, n0 = int(ts[0]), int(ts[0]), 0
        prev = np.concatenate(([end_us], ts[:-1]))
        bounds = np.flatnonzero(ts - np.maximum(prev, end_us) > gap_us)
        firsts = np.concatenate(([0], bounds))
        counts = np.diff(np.concatenate((firsts, [ts.size])))
        starts = ts[firsts]
        ends = ts[np.concatenate((bounds, [ts.size])) - 1]
        # segment 0 continues the carried session (or starts fresh): a
        # late in-watermark event BELOW the carried start must lower
        # session_start (the batch oracle reports min(ts) per session)
        starts[0] = start_us if counts[0] == 0 else min(start_us, int(ts[0]))
        ends[0] = end_us if counts[0] == 0 else max(int(ends[0]), end_us)
        counts[0] += n0
        c_start, c_end, c_n = starts[:-1], ends[:-1], counts[:-1]
        start_us, end_us, n = int(starts[-1]), int(ends[-1]), int(counts[-1])
        timeout_ms = (end_us + gap_us) // 1000 + 1
        if timeout_ms <= state.getCurrentWatermarkMs():
            # the watermark already passed the session's close point
            # (can happen when this key's batch slice is processed after
            # other slices advanced the watermark): close immediately.
            c_start = np.append(c_start, start_us)
            c_end = np.append(c_end, end_us)
            c_n = np.append(c_n, n)
            state.remove() if state.exists else None
        else:
            state.update((start_us, end_us, n))
            # close the open session after gap_sec of event-time inactivity
            state.setTimeoutTimestamp(timeout_ms)
        if c_start.size:
            # emission is array-built too — a skewed slice can close
            # thousands of sessions and must not fall back to a row loop
            yield pd.DataFrame({
                "user_id": np.full(c_start.size, user_id, dtype=np.int64),
                "session_start": pd.to_datetime(c_start.astype(np.int64), unit="us"),
                "session_end": pd.to_datetime(c_end.astype(np.int64), unit="us"),
                "n_events": c_n.astype(np.int64),
            })

    return fn


def sessionize_stream(events: DataFrame, gap_sec: int = 1800,
                      watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: event-time
    sessions per user with an inactivity gap. A session closes (and is
    emitted) either when a newer event arrives past the gap, or when the
    event-time timeout fires after the watermark passes session_end+gap.
    State per user is one compact triple — memory is O(active users)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_sec),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )



def dedup_events_stream(src: DataFrame, key_cols: list[str] | None = None,
                        watermark: str = "2 hours",
                        ts_col: str = "ts") -> DataFrame:
    """Streaming exact deduplication: keep the FIRST occurrence of each
    key, dropping duplicates that arrive within the watermark horizon of
    it (``dropDuplicatesWithinWatermark``). The streaming-ingest
    counterpart of exact_dedup: state per key is one timestamp and is
    EVICTED once the watermark passes it — bounded by keys-per-horizon,
    not stream length, which is what makes exact dedup viable on an
    unbounded 10^10-event feed (an unbounded dropDuplicates would hold
    every key forever)."""
    key_cols = key_cols or ["event_id"]
    return (
        src.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
    )
