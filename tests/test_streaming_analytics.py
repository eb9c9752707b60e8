"""Structured-Streaming analytics: watermarked windowed agg equals the
batch aggregation on a bounded drain; stateful sessionization
(applyInPandasWithState) matches the batch window-function sessionizer."""
import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from database_delta_plugins_spark.streaming.analytics import (
    hourly_counts_stream,
    read_events_stream,
    sessionize_stream,
)


def _drain(q, timeout=180):
    q.awaitTermination(timeout)
    deadline = time.time() + 10
    while q.isActive and time.time() < deadline:
        time.sleep(0.2)


def _stream_dir(spark, sf_dir, tmp_path) -> str:
    """File-stream source needs a DIRECTORY of time-ordered chunks (the
    arrival-order analogue of a binlog feed)."""
    from database_delta_plugins_spark.streaming.analytics import (
        write_time_ordered_stream,
    )

    d = str(tmp_path / "events_stream")
    write_time_ordered_stream(
        spark, spark.read.parquet(f"{sf_dir}/events.parquet"), d, n_chunks=4)
    return d


def test_hourly_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    events_dir = _stream_dir(spark, sf_dir, tmp_path)
    src = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    out = hourly_counts_stream(src)
    q = (
        out.writeStream.format("memory").queryName("hourly_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.sql("select * from hourly_sink").orderBy("hour", "event_type")
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .orderBy("hour", "event_type")
    )
    # append mode only FINALIZES windows behind the final watermark; on a
    # bounded drain the tail windows stay open, so the emitted rows must
    # be a prefix-subset of the batch result and exactly match on values.
    g = {(r["hour"], r["event_type"]): (r["n"], r["total_value"]) for r in got.collect()}
    b = {(r["hour"], r["event_type"]): (r["n"], r["total_value"]) for r in batch.collect()}
    assert len(g) > 0
    assert set(g) <= set(b)
    assert all(g[k] == b[k] for k in g)
    # everything except the open watermark tail was finalized
    max_hour = max(h for h, _t in b)
    missing = set(b) - set(g)
    assert all((max_hour - h).total_seconds() <= 3 * 3600 for h, _t in missing)


def test_sessionize_stream_matches_batch(spark, sf_dir, tmp_path):
    events_dir = _stream_dir(spark, sf_dir, tmp_path)
    src = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    out = sessionize_stream(src, gap_sec=1800)
    q = (
        out.writeStream.format("memory").queryName("sess_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cks"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.sql("select * from sess_sink")
    # batch sessionizer (same gap) for ground truth
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("_ns", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("_sid", F.sum("_ns").over(w))
    )
    batch = (
        ev.groupBy("user_id", "_sid")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
    )
    g = {(r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
         for r in got.collect()}
    b = {(r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
         for r in batch.collect()}
    assert len(g) > 0
    # every emitted (closed) session must be a true batch session;
    # the stream may still hold open sessions near the final watermark
    assert set(g) <= set(b)
    assert all(g[k] == b[k] for k in g)
    # and most sessions should have closed on a bounded drain
    assert len(g) >= 0.5 * len(b)


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    """A feed with every event duplicated (replayed source) streams
    through dedup_events_stream to exactly the distinct event set."""
    import tempfile

    from database_delta_plugins_spark.streaming.analytics import (
        dedup_events_stream,
        read_events_stream,
        write_time_ordered_stream,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type", "ts", "value")
    doubled = ev.unionByName(ev)
    d = str(tmp_path / "dupstream")
    write_time_ordered_stream(spark, doubled, d, n_chunks=3)
    src = read_events_stream(spark, d, max_files_per_trigger=1)
    q = (
        dedup_events_stream(src).writeStream.format("memory")
        .queryName("dedup_sink").outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from dedup_sink")
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()


class _FakeState:
    """Minimal GroupState stand-in to drive _sessionize_fn directly."""

    def __init__(self, value=None, watermark_ms=0):
        self._v = value
        self.hasTimedOut = False
        self._wm = watermark_ms
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms

    def getCurrentWatermarkMs(self):
        return self._wm


def _ref_sessionize(ts_us, carried, gap_us):
    """Straightforward per-event reference (the pre-r3 loop semantics)."""
    ts_us = sorted(ts_us)
    if carried:
        start, end, n = carried
    else:
        start, end, n = ts_us[0], ts_us[0], 0
    closed = []
    for t in ts_us:
        if n and t - end > gap_us:
            closed.append((start, end, n))
            start, n = t, 0
        start = min(start, t)   # late event below the carried start
        end = max(end, t)
        n += 1
    return closed, (start, end, n)


def test_sessionize_vectorized_matches_reference():
    """r3 directive #7: the vectorized (diff/cumsum) batch splitter is
    event-for-event equivalent to the sequential per-event walk —
    including carried-state merges, out-of-order arrivals below the
    carried end, and batches whose first event opens a new session."""
    import random
    import pandas as pd
    from database_delta_plugins_spark.streaming.analytics import _sessionize_fn

    gap_sec = 60
    gap_us = gap_sec * 1_000_000
    rng = random.Random(7)
    for trial in range(40):
        n_ev = rng.randint(1, 400)
        base = 1_700_000_000 * 1_000_000
        t = base
        ts = []
        for _ in range(n_ev):
            t += rng.choice([1, 10, 30, 59, 61, 120, 600]) * 1_000_000 \
                + rng.randint(-5, 5) * 1_000_000
            ts.append(t)
        rng.shuffle(ts)
        carried = None
        if trial % 2:
            carried = (base - 300_000_000, base + rng.choice([0, 30, 100])
                       * 1_000_000, rng.randint(1, 5))
        st = _FakeState(carried)
        fn = _sessionize_fn(gap_sec)
        out = list(fn((1,), iter([pd.DataFrame({
            "ts": pd.to_datetime(pd.Series(ts), unit="us")})]), st))
        got_closed = []
        for pdf in out:
            for _, r in pdf.iterrows():
                got_closed.append((
                    int(r["session_start"].value // 1000),
                    int(r["session_end"].value // 1000),
                    int(r["n_events"])))
        exp_closed, exp_open = _ref_sessionize(ts, carried, gap_us)
        assert got_closed == exp_closed, f"trial {trial}"
        assert st.get == exp_open, f"trial {trial}"


def test_sessionize_hot_user_batch_is_vectorized():
    """Zipf-hot-user microbench: 500k events in one group slice stays
    group math (numpy), not a per-event Python walk — sub-second where
    the row loop took many seconds."""
    import time

    import numpy as np
    import pandas as pd

    from database_delta_plugins_spark.streaming.analytics import _sessionize_fn

    n = 500_000
    ts = (1_700_000_000_000_000
          + np.cumsum(np.random.default_rng(1).integers(1, 120, n))
          * 1_000_000)
    pdf = pd.DataFrame({"ts": pd.to_datetime(pd.Series(ts), unit="us")})
    st = _FakeState(None)
    fn = _sessionize_fn(60)
    t0 = time.time()
    out = list(fn((1,), iter([pdf]), st))
    dt = time.time() - t0
    n_closed = sum(len(p) for p in out)
    assert n_closed > 1000          # plenty of sessions split
    assert st.get is not None       # open tail retained
    assert dt < 2.0, f"hot-user slice took {dt:.2f}s — not vectorized?"


def test_time_ordered_write_all_null_ts(spark, tmp_path):
    """ADVICE r3: a non-empty source whose ts column is entirely NULL
    yields all-None percentile edges; the writer must fall back to the
    single-chunk path instead of appending the full row set n_chunks
    times."""
    from pyspark.sql import functions as F

    from database_delta_plugins_spark.streaming.analytics import (
        write_time_ordered_stream,
    )

    src = spark.range(10).select(
        F.col("id").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    d = str(tmp_path / "nullts")
    write_time_ordered_stream(spark, src, d, n_chunks=4)
    assert spark.read.parquet(d).count() == 10
