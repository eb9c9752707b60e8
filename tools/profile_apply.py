"""Per-stage scaling profile of the bench apply path.

Runs the full streaming apply once at each requested core count (same
cached bench event log as bench.py) with Spark event logging on, then
prints a per-stage table: wall (submit->complete), task-time sum,
executor CPU sum, task count, and the stage's scaling between levels.
Use it to find WHICH stage burns the efficiency gate, instead of
guessing from end-to-end wall.

Usage: python tools/profile_apply.py [cores ...]   (default: 2 8)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import shutil
import subprocess
import sys
import tempfile

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


def parse_eventlog(evt_dir: str) -> dict:
    stages = {}   # (stageId, attempt) -> info
    jobs = {}
    app = {"start": None, "end": None}
    for root, _d, files in os.walk(evt_dir):
        for fn in files:
            if fn.startswith("appstatus"):
                continue
            with open(os.path.join(root, fn)) as f:
                for line in f:
                    try:
                        e = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    ev = e.get("Event")
                    if ev == "SparkListenerApplicationStart":
                        app["start"] = e["Timestamp"]
                    elif ev == "SparkListenerApplicationEnd":
                        app["end"] = e["Timestamp"]
                    elif ev == "SparkListenerStageCompleted":
                        si = e["Stage Info"]
                        s = stages.setdefault(si["Stage ID"], {"cpu_ns": 0, "run_ms": 0})
                        s["name"] = si["Stage Name"].split("\n")[0][:70]
                        s["tasks"] = si["Number of Tasks"]
                        s["submit"] = si.get("Submission Time")
                        s["complete"] = si.get("Completion Time")
                    elif ev == "SparkListenerTaskEnd":
                        k = e["Stage ID"]
                        m = e.get("Task Metrics") or {}
                        s = stages.setdefault(k, {"cpu_ns": 0, "run_ms": 0})
                        s["cpu_ns"] += m.get("Executor CPU Time", 0)
                        s["run_ms"] += m.get("Executor Run Time", 0)
                    elif ev == "SparkListenerJobStart":
                        desc = (e.get("Properties") or {}).get(
                            "spark.job.description", "")[:60]
                        jobs[e["Job ID"]] = {"start": e["Submission Time"],
                                             "desc": desc,
                                             "stages": [s["Stage ID"] for s in e["Stage Infos"]]}
                    elif ev == "SparkListenerJobEnd":
                        if e["Job ID"] in jobs:
                            jobs[e["Job ID"]]["end"] = e["Completion Time"]
    return {"stages": stages, "jobs": jobs, "app": app}


import os  # noqa: E402


def run_one(cores: int) -> dict:
    """Run the bench apply worker at `cores`, keep the event log, parse."""
    evt_dir = tempfile.mkdtemp(prefix=f"prof_evt_{cores}_")
    env = dict(os.environ, PROF_EVENTLOG_DIR=evt_dir)
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "profile_worker.py"), str(cores)],
        capture_output=True, text=True, cwd=REPO, timeout=3600, env=env)
    line = next((ln for ln in p.stdout.splitlines() if ln.startswith("WORKER_RESULT ")), None)
    if line is None:
        sys.stderr.write(p.stdout[-3000:] + p.stderr[-5000:])
        raise RuntimeError("worker failed")
    res = json.loads(line[len("WORKER_RESULT "):])
    res["prof"] = parse_eventlog(evt_dir)
    shutil.rmtree(evt_dir, ignore_errors=True)
    return res


def main():
    levels = [int(x) for x in sys.argv[1:]] or [2, 8]
    out = {c: run_one(c) for c in levels}
    for c, r in out.items():
        print(f"\n=== local[{c}]: wall {r['wall_sec']}s, "
              f"{r['events_per_sec']} ev/s, cpu {r.get('cpu_sec')}s ===")
        st = r["prof"]["stages"]
        # attach the owning job's description to each stage name
        for j in r["prof"]["jobs"].values():
            if j.get("desc"):
                for sid in j["stages"]:
                    if sid in st and st[sid].get("name"):
                        st[sid]["name"] = f"[{j['desc']}] {st[sid]['name']}"[:80]
        # order by wall
        rows = []
        for sid, s in st.items():
            w = (s["complete"] - s["submit"]) / 1e3 if s.get("submit") and s.get("complete") else 0
            rows.append((w, sid, s))
        rows.sort(reverse=True)
        tot_gap = None
        app = r["prof"]["app"]
        if app["start"] and app["end"]:
            app_wall = (app["end"] - app["start"]) / 1e3
            stage_wall = sum(w for w, _, _ in rows)
            print(f"app wall {app_wall:.1f}s; sum stage wall {stage_wall:.1f}s "
                  f"(overlap possible); jobs: {len(r['prof']['jobs'])}")
        print(f"{'wall_s':>7} {'cpu_s':>7} {'run_s':>7} {'tasks':>5}  name")
        for w, sid, s in rows[:22]:
            print(f"{w:7.2f} {s['cpu_ns'] / 1e9:7.2f} {s['run_ms'] / 1e3:7.2f} "
                  f"{s['tasks']:5d}  s{sid} {s['name']}")
    for c, r in out.items():
        jobs = sorted(r["prof"]["jobs"].items(), key=lambda kv: kv[1]["start"])
        if not jobs:
            continue
        t00 = jobs[0][1]["start"]
        print(f"\n--- local[{c}] job timeline (rel s, dur s, gap-before s) ---")
        prev_end = None
        for jid, j in jobs:
            if "end" not in j:
                continue
            gap = (j["start"] - prev_end) / 1e3 if prev_end else 0.0
            print(f"j{jid:<3} rel={(j['start'] - t00) / 1e3:7.2f} "
                  f"dur={(j['end'] - j['start']) / 1e3:6.2f} gap={gap:6.2f}  {j.get('desc', '')[:50]}")
            prev_end = j["end"]
    if len(levels) == 2:
        a, b = levels
        print(f"\n=== scaling {a}->{b} (matched by stage name) ===")
        def by_name(r):
            m = {}
            for sid, s in r["prof"]["stages"].items():
                w = (s["complete"] - s["submit"]) / 1e3 if s.get("submit") and s.get("complete") else 0
                e = m.setdefault(s["name"], {"wall": 0, "cpu": 0, "n": 0})
                e["wall"] += w
                e["cpu"] += s["cpu_ns"] / 1e9
                e["n"] += 1
            return m
        ma, mb = by_name(out[a]), by_name(out[b])
        print(f"{'wall_a':>7} {'wall_b':>7} {'eff':>5} {'cpu_a':>7} {'cpu_b':>7}  name")
        rows = sorted(ma.items(), key=lambda kv: -kv[1]["wall"])
        for name, ea in rows[:22]:
            eb = mb.get(name)
            if not eb or eb["wall"] == 0:
                continue
            eff = (ea["wall"] / eb["wall"]) / (b / a)
            print(f"{ea['wall']:7.2f} {eb['wall']:7.2f} {eff:5.2f} "
                  f"{ea['cpu']:7.2f} {eb['cpu']:7.2f}  {name}")


if __name__ == "__main__":
    main()
