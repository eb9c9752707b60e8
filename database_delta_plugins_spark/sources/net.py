"""Network-shaped change-event transport (r4 — the S2 wire-tail
analogue).

The reference tails a LIVE database over the wire
(mysql/MySqlEventReader.java:164-170: the embedded engine connects to
the source host and streams binlog events); this module provides the
engine's equivalent transport: a TCP server that tails a
Debezium-JSON-lines event log to any connected client, consumed by
``CDCPipeline(source_format="socket", event_log_dir="host:port")``
through Spark's socket source and the SAME envelope decode as the file
sources.

Semantics mirrored from the reference:

* **Reconnect = replay from the requested position.** A binlog client
  that reconnects re-reads from its stored offset. Spark's socket
  source keeps no offsets and cannot send one, so the position is
  supplied SERVER-SIDE per connection: ``from_lsn`` may be a callable
  (evaluated at each accept) that reads the consumer's durable frontier
  — ``CDCPipeline.committed_frontier`` reads it straight from the lake
  table's commit lineage, exactly where the reference's connector
  stores its offset. A restart then streams only the tail beyond the
  committed frontier, not the whole history (r4 re-tailed from 0; at
  100 TB that re-ships the entire log over the wire to be discarded).
  The D11 lsn replay filter + epoch fences still make any overlap
  exactly-once, so a stale/0 frontier stays CORRECT — just wasteful.
* **In-order delivery.** Files are served in name order (the log writer
  chunks by lsn range), each line one envelope JSON object — the binlog
  total order (lsn, seq) arrives monotonically, like a real tail.
* **A dropped client never kills the tail server** (r5, ADVICE): a
  mid-stream disconnect (BrokenPipeError/ConnectionResetError from
  sendall) is the client's problem; the server keeps accepting so the
  documented reconnect-recovery path and Spark task retries work.

In production the transport would be a Kafka topic (same JSON-lines
envelope, replayable offsets, no fencing dependence); the sandbox has
no Kafka, and the socket path proves the live-wire decode surface with
stdlib only.
"""

from __future__ import annotations

import json
import os
import socket
import threading
from collections.abc import Callable, Iterator


class LogServer:
    """Handle for a running jsonl-log tail server. Iterable as
    ``(thread, port)`` for back-compat with r4 callers; ``stats`` holds
    one dict per finished connection: ``{"from_lsn", "events",
    "bytes", "complete"}`` (``complete`` False when the client dropped
    mid-stream) — the wire-cost audit the tail-proportionality tests
    read."""

    def __init__(self, thread: threading.Thread, port: int,
                 sock: socket.socket):
        self.thread = thread
        self.port = port
        self._sock = sock
        self.stats: list[dict] = []

    def __iter__(self) -> Iterator:
        return iter((self.thread, self.port))

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


def serve_jsonl_log(json_log_dir: str, host: str = "127.0.0.1",
                    port: int = 0,
                    from_lsn: int | Callable[[], int] = 0,
                    max_clients: int = 4) -> LogServer:
    """Serve a Debezium-JSON-lines event log dir (``df.write.json``
    output) over TCP. Returns a :class:`LogServer` (unpacks as
    ``(thread, port)``). Each connecting client gets the tail strictly
    beyond ``from_lsn``, then the connection closes (a bounded log's
    EOF); the server stops after ``max_clients`` connections or when
    its socket is closed.

    ``from_lsn`` may be a callable evaluated at EACH accept — the
    binlog "start from position" contract with the position read from
    the consumer's durable offset store (``CDCPipeline.
    committed_frontier``) at reconnect time, so a restarted consumer
    is served only what it has not committed. Filtering is line-side
    (cheap JSON peek), so the wire carries only post-frontier events."""
    srv = socket.create_server((host, port))
    bound_port = srv.getsockname()[1]
    files = sorted(
        os.path.join(json_log_dir, f) for f in os.listdir(json_log_dir)
        if f.endswith(".json") and not f.startswith(("_", "."))
    )
    server = LogServer(threading.Thread(), bound_port, srv)

    def _serve_one(conn: socket.socket, st: dict) -> None:
        lo = from_lsn() if callable(from_lsn) else from_lsn
        st["from_lsn"] = int(lo)
        with conn:
            for path in files:
                with open(path, "rb") as f:
                    for line in f:
                        line = line.strip()
                        if not line:
                            continue
                        if lo:
                            try:
                                if json.loads(line).get("lsn", 0) <= lo:
                                    continue
                            except json.JSONDecodeError:
                                pass
                        conn.sendall(line + b"\n")
                        st["events"] += 1
                        st["bytes"] += len(line) + 1
        st["complete"] = True

    def run() -> None:
        served = 0
        try:
            while served < max_clients:
                try:
                    conn, _ = srv.accept()
                except OSError:
                    break
                # ADVICE r4: one dropped client (BrokenPipe/Reset out of
                # sendall) must not take down the listener — record the
                # partial serve and keep accepting. r5: catch Exception,
                # not just OSError — a CALLABLE from_lsn runs arbitrary
                # frontier-lookup code (LakeTable.load via py4j) on this
                # thread at every accept, and a transient error there
                # would otherwise kill the accept loop and close the
                # listening socket, leaving every future reconnect (the
                # documented recovery path) with connection refused. The
                # connection is closed here, not in _serve_one, so a
                # pre-`with conn:` failure cannot leak the socket.
                st = {"from_lsn": 0, "events": 0, "bytes": 0,
                      "complete": False, "error": None}
                server.stats.append(st)
                try:
                    _serve_one(conn, st)
                except Exception as e:  # noqa: BLE001 — listener must live
                    st["error"] = repr(e)
                finally:
                    try:
                        conn.close()
                    except OSError:
                        pass
                served += 1
        finally:
            try:
                srv.close()
            except OSError:
                pass

    th = threading.Thread(target=run, daemon=True,
                          name=f"jsonl-log-server:{bound_port}")
    server.thread = th
    th.start()
    return server
