"""Round-6 optimization harness — NOT the driver bench (bench.py is
frozen for measurement). Times individual headline queries with the
exact session + warmup posture of bench.run_queries, so numbers are
comparable to BENCH_r05.json; optionally captures .explain("formatted")
per query into plans/r06/.

Usage:
  python bench_extra.py [--rounds N] [--plans SUFFIX] [query ...]

With --plans SUFFIX, each query's formatted plan is written to
plans/r06/<query>_<SUFFIX>.txt (before/after evidence for the judge).
Timing uses .count() like bench.run_queries (the frozen protocol), so
measured numbers are apples-to-apples with the driver's.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADS = ["cdc_apply_lww", "cdc_merge_upsert", "cdc_mor_deep_read",
         "dedup_exact", "minhash_lsh", "ngram_jaccard", "simhash",
         "ann_cosine_topk", "embed_neardup", "text_quality",
         "events_sessions", "training_corpus"]


def main() -> None:
    args = [a for a in sys.argv[1:]]
    rounds = 3
    plans = None
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i:i + 2]
    if "--plans" in args:
        i = args.index("--plans")
        plans = args[i + 1]
        del args[i:i + 2]
    heads = args or HEADS

    import __spark_entry__ as entrymod
    from database_delta_plugins_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", app_name="bench-extra",
                      shuffle_partitions=CPUS)
    qs = entrymod.queries()
    # warmup identical to bench.run_queries
    qs["cdc_apply_lww"](spark, SF_DIR).count()
    qs["dedup_exact"](spark, SF_DIR).count()

    if plans:
        os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
        for name in heads:
            df = qs[name](spark, SF_DIR)
            p = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(REPO, "plans", "r06",
                                   f"{name}_{plans}.txt"), "w") as f:
                f.write(p)
            print(f"wrote plans/r06/{name}_{plans}.txt")

    times: dict[str, list[float]] = {h: [] for h in heads}
    for _ in range(rounds):
        for name in heads:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            times[name].append(round(time.time() - t0, 2))
            spark.sparkContext.setJobDescription(None)
    out = {h: min(times[h]) for h in heads}
    print("RUNS " + json.dumps(times))
    print("MIN " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
