"""Process-tree CPU accounting: total utime+stime of this process and
ALL live descendants (the JVM, its Python UDF workers, shuffle
externals), sampled from /proc.

Why: Spark's event-log "Executor CPU Time" counts ONLY JVM task
threads — pandas-UDF compute runs in sidecar Python workers invisible
to it. The bench's CPU-invariance evidence (software does the same
total work per event at N and 4N parallelism; wall divergence is
machine contention) needs the WHOLE tree.

Counters are cumulative-monotone, so one snapshot just before teardown
captures everything still alive; a background sampler keeps the running
max so short-lived children are approximately included too.
"""

from __future__ import annotations

import os
import threading
import time

_CLK = os.sysconf("SC_CLK_TCK")


def _all_procs() -> dict[int, tuple[int, float]]:
    """pid -> (ppid, cpu_sec) for every live process."""
    out = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                s = f.read()
        except OSError:
            continue
        # fields after the (comm) — comm may contain spaces/parens
        rest = s.rsplit(")", 1)[-1].split()
        try:
            ppid = int(rest[1])
            cpu = (int(rest[11]) + int(rest[12])) / _CLK  # utime+stime
        except (IndexError, ValueError):
            continue
        out[int(pid)] = (ppid, cpu)
    return out


def tree_cpu_seconds(root: int | None = None) -> float:
    """Sum of cpu seconds over root + its live descendants."""
    root = root if root is not None else os.getpid()
    procs = _all_procs()
    children: dict[int, list[int]] = {}
    for pid, (ppid, _c) in procs.items():
        children.setdefault(ppid, []).append(pid)
    total, stack, seen = 0.0, [root], set()
    while stack:
        p = stack.pop()
        if p in seen or p not in procs:
            continue
        seen.add(p)
        total += procs[p][1]
        stack.extend(children.get(p, []))
    return total


class TreeCpuSampler:
    """Track max cumulative tree CPU (per-pid high-water marks, summed) —
    robust to children exiting between samples."""

    def __init__(self, interval: float = 0.5, root: int | None = None):
        self.root = root if root is not None else os.getpid()
        self.interval = interval
        self._marks: dict[int, float] = {}
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _sample(self) -> None:
        procs = _all_procs()
        children: dict[int, list[int]] = {}
        for pid, (ppid, _c) in procs.items():
            children.setdefault(ppid, []).append(pid)
        stack, seen = [self.root], set()
        while stack:
            p = stack.pop()
            if p in seen or p not in procs:
                continue
            seen.add(p)
            self._marks[p] = max(self._marks.get(p, 0.0), procs[p][1])
            stack.extend(children.get(p, []))

    def _run(self) -> None:
        while not self._stop.is_set():
            self._sample()
            self._stop.wait(self.interval)
        self._sample()

    def __enter__(self) -> "TreeCpuSampler":
        self._base = tree_cpu_seconds(self.root)
        self._marks = {}
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> bool:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
        return False

    def cpu_seconds(self) -> float:
        """Tree CPU consumed since __enter__ (high-water sum - baseline)."""
        return max(0.0, sum(self._marks.values()) - self._base)
