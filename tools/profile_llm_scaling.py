"""Stage-level 1-vs-4-core profile for the two LLM ops whose per-op
scaling lacked a named ceiling in r4 (BENCH/BASELINE.md: minhash_lsh
0.708, embed_neardup 0.75 — below the 0.8 bar, cause unattributed).

Each phase is timed END TO END — DataFrame construction (py4j +
analysis, pure driver), lazy-checkpoint wrapping, AND the
materializing count — because the driver-side portion is exactly the
core-count-invariant serial floor being hunted. (The first cut of
this tool timed only the final counts and silently parked ~80% of the
wall in un-timed construction — phase attribution was garbage. The
lesson is general: with lazy localCheckpoints, work is forced at
wrapper-call/first-action time, so a phase budget must bracket the
whole phase, not the last action.)

Usage:  python tools/profile_llm_scaling.py            # orchestrates both pins
        python tools/profile_llm_scaling.py --cores N  # one pinned worker
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _phases_minhash(spark, corpus: str, entrymod) -> dict:
    """minhash_lsh_pairs internals split at its checkpoint boundaries
    (operators/dedup.py:minhash_lsh_pairs — same params as the bench:
    threshold=0.3 => bands=16). Each phase = construction +
    materialization of one checkpoint frontier."""
    from pyspark.sql import functions as F

    from database_delta_plugins_spark.operators.dedup import (
        _band_rows,
        _cap_postings,
        _shingle_base,
        _verify_exact_jaccard,
        minhash_signature_arrow,
    )

    out = {}
    t0 = time.time()

    def mark(label):
        nonlocal t0
        out[label] = round(time.time() - t0, 2)
        t0 = time.time()

    docs = entrymod._docs(spark, corpus)
    base = _shingle_base(docs, "doc_id", "text", 3)
    sigs = minhash_signature_arrow(base)
    # the SHARED banding helper (r5) — the profiler must measure the
    # production kernel, not a hand-copied snapshot of it
    bandrows = _band_rows(sigs, bands=16)
    bandrows = _cap_postings(bandrows, ["band", "band_hash"], 50) \
        .localCheckpoint(eager=False)
    bandrows.count()
    mark("sig_bandrows")          # shingle+kernel+band+cap, one pass
    a = bandrows.select("band", "band_hash", F.col("id").alias("id_a"))
    b = bandrows.select("band", "band_hash", F.col("id").alias("id_b"))
    cand = (a.join(b, ["band", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").dropDuplicates(["id_a", "id_b"]))
    cand = cand.localCheckpoint(eager=False)
    cand.count()
    mark("band_join")
    _verify_exact_jaccard(cand, docs, "doc_id", "text", 3, 0.3).count()
    mark("verify")
    return out


def _phases_embed(spark, corpus: str, entrymod) -> dict:
    """cosine_neardup_pairs_arrow internals (the bench's production
    posture: GEMM scorer, cap 200, bits grown for the x32 corpus)."""
    from database_delta_plugins_spark.operators.similarity import (
        _cap_sig_bucket,
        cosine_neardup_pairs_arrow,
        lsh_signature_arrow,
    )

    out = {}
    t0 = time.time()

    def mark(label):
        nonlocal t0
        out[label] = round(time.time() - t0, 2)
        t0 = time.time()

    dbl = entrymod._dbl(entrymod._emb(spark, corpus))
    dim = len(dbl.head()["embedding"])
    mark("dim_head")              # one-row corpus probe
    bits = entrymod._NEARDUP_BITS + 5  # LLM_EMB_MULT=32 -> +5, as in bench
    s = lsh_signature_arrow(dbl.select("vec_id", "embedding"), dim, bits=bits)
    s = _cap_sig_bucket(s, "vec_id", 200).localCheckpoint(eager=False)
    s.count()
    mark("signature")
    # full op (signature recomputed inside) minus measured signature ≈
    # bucket groupBy + GEMM + dedup
    cosine_neardup_pairs_arrow(
        dbl, dim=dim, threshold=entrymod._NEARDUP_T, bits=bits,
        max_bucket=200).count()
    mark("full_op")
    out["gemm_phase_est"] = round(out["full_op"] - out["signature"], 2)
    return out


def run_worker(cores: int) -> None:
    import __spark_entry__ as entrymod
    import bench
    from database_delta_plugins_spark.session import get_spark

    corpus = bench.ensure_llm_corpus()
    spark = get_spark(master=f"local[{cores}]",
                      app_name=f"profile-llm-{cores}", shuffle_partitions=8)
    # warmup on the small corpus: codegen + Arrow workers per core
    entrymod.queries()["minhash_lsh"](spark, bench.SF_DIR).count()
    entrymod.queries()["embed_neardup"](spark, bench.SF_DIR).count()
    res = {"cores": cores,
           "minhash": _phases_minhash(spark, corpus, entrymod),
           "embed": _phases_embed(spark, corpus, entrymod)}
    spark.stop()
    print("WORKER_RESULT " + json.dumps(res))


def main() -> None:
    if "--cores" in sys.argv:
        run_worker(int(sys.argv[sys.argv.index("--cores") + 1]))
        return
    import bench

    bench.ensure_llm_corpus()
    results = {}
    for rep in range(2):
        for c in (1, 4):
            bench._wait_for_quiet()
            pin = (["taskset", "-c", f"0-{c - 1}" if c > 1 else "0"]
                   if shutil.which("taskset") else [])
            p = subprocess.run(
                pin + [sys.executable, os.path.abspath(__file__),
                       "--cores", str(c)],
                capture_output=True, text=True, cwd=REPO, timeout=3600)
            line = next((ln for ln in p.stdout.splitlines()
                         if ln.startswith("WORKER_RESULT ")), None)
            if line is None:
                sys.stderr.write(p.stdout[-2000:] + p.stderr[-4000:])
                raise RuntimeError(f"profile worker cores={c} failed")
            r = json.loads(line[len("WORKER_RESULT "):])
            results.setdefault(c, []).append(r)
    summary = {}
    for op in ("minhash", "embed"):
        phases = results[1][0][op].keys()
        summary[op] = {}
        for ph in phases:
            t1 = min(r[op][ph] for r in results[1])
            t4 = min(r[op][ph] for r in results[4])
            summary[op][ph] = {
                "local1_sec": t1, "local4_sec": t4,
                "efficiency_1_to_4": round(t1 / (4 * t4), 3) if t4 else None}
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
