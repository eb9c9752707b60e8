"""Streaming health + throughput metrics (SURVEY.md §2.5 C2/C3).

The reference reports per-record health (`context.setOK`) and propagates
engine death via a completion callback (mysql/MySqlRecordConsumer.java:
115-119; common/NotifyingCompletionCallback.java:38-50). The Spark
analogue: a StreamingQueryListener collecting per-micro-batch progress
(rows, duration, rows/sec) and terminal exceptions; hard failures
propagate as exceptions out of foreachBatch (failing the query).
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class ThroughputListener(StreamingQueryListener):
    """Collects per-batch progress + terminal state for one session."""

    def __init__(self):
        self.progress: list[dict] = []
        self.terminated: list[dict] = []
        self.sink_rows: list[dict] = []

    def record_sink_rows(self, epoch_id, rows: int) -> None:
        """Sink-side rows-applied per epoch, reported by the pipeline.
        Source-side numInputRows reads 0 by design: the apply path
        re-reads the micro-batch as a real file scan (pruning+pushdown;
        see CDCPipeline._batch_files), so the handed-over batch plan —
        which source metrics are derived from — never executes."""
        self.sink_rows.append({"epoch_id": str(epoch_id), "rows": int(rows)})

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        self.progress.append({
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_sec": p.inputRowsPerSecond,
            "process_rows_per_sec": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs or {}),
        })

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self.terminated.append({
            "query_id": str(event.id),
            "exception": event.exception,
        })

    # ----- summaries -----
    def total_input_rows(self) -> int:
        """Source-side events read (streaming numInputRows). Reads 0 on
        the file-rebound apply path (see record_sink_rows)."""
        return sum(p["num_input_rows"] for p in self.progress)

    def total_applied_rows(self) -> int:
        """Sink-side post-LWW winner rows committed by the pipeline."""
        return sum(r["rows"] for r in self.sink_rows)

    def total_rows(self) -> int:
        """Liveness indicator: rows seen on EITHER side (max, not sum —
        summing double-counted epochs whose handed-over plan executed
        AND mixed input events with winner rows; ADVICE r2). For rates,
        use the typed accessors above."""
        return max(self.total_input_rows(), self.total_applied_rows())

    def failed(self) -> bool:
        return any(t["exception"] for t in self.terminated)
