"""Worker for profile_apply.py: one bench apply at argv[1] cores with
the Spark event log kept at $PROF_EVENTLOG_DIR."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import shutil
import sys
import tempfile
import time


def main():
    cores = int(sys.argv[1])
    evt_dir = os.environ["PROF_EVENTLOG_DIR"]
    import bench
    from pyspark.sql import functions as F

    from database_delta_plugins_spark.functions.udfs import extract_text
    from database_delta_plugins_spark.session import get_spark
    from database_delta_plugins_spark.streaming.pipeline import CDCPipeline

    n_events = bench.ensure_event_log()
    spark = get_spark(
        master=f"local[{cores}]", app_name=f"prof-apply-{cores}",
        shuffle_partitions=cores,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evt_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    work = tempfile.mkdtemp(prefix=f"prof_apply_{cores}_")
    try:
        pipe = CDCPipeline(
            spark, bench._log_dir(), f"{work}/table", f"{work}/ckpt",
            num_buckets=bench.CPUS, max_files_per_trigger=bench.CPUS,
            salt_buckets=bench.CPUS * 2,
            derive_text_from_html=True, normalize_lang=True,
        )
        pipe.bootstrap(replicate_existing_data=False)
        ev = spark.read.parquet(bench._log_dir())
        ev.count()
        (ev.limit(2048)
           .select(F.length(extract_text(F.col("after.html"))).alias("n"))
           .agg(F.sum("n")).collect())
        # full-pipeline pre-warm on a throwaway 2-file table (match bench)
        wfiles = sorted(f for f in os.listdir(bench._log_dir())
                        if f.endswith(".parquet"))[:2]
        wlog = f"{work}/warm_log"
        os.makedirs(wlog)
        for f in wfiles:
            shutil.copy(os.path.join(bench._log_dir(), f),
                        os.path.join(wlog, f))
        CDCPipeline(
            spark, wlog, f"{work}/warm_table", f"{work}/warm_ckpt",
            num_buckets=bench.CPUS, max_files_per_trigger=1,
            salt_buckets=bench.CPUS * 2,
            derive_text_from_html=True, normalize_lang=True,
        ).run_to_completion()
        t0 = time.time()
        pipe.run_to_completion()
        wall = time.time() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    print("WORKER_RESULT " + json.dumps({
        "cores": cores, "wall_sec": round(wall, 2),
        "events_per_sec": round(n_events / wall, 1),
    }))


if __name__ == "__main__":
    main()
