"""spark-submit entrypoint — the north rule's cluster launch shape:

    spark-submit --master local[4] \
        --py-files dist/database_delta_plugins_spark.zip \
        tools/submit_job.py <sf_dir> <workdir>

Everything imports from the --py-files zip (this script lives outside
the package on purpose); runs a small but complete CDC apply — event-log
generation -> streaming pipeline to completion -> read-back — and prints
one `SUBMIT_OK ...` line for the caller to assert on. Master, executor
config, etc. come from spark-submit, as on a real cluster.
"""
import sys


def main() -> None:
    sf_dir, work = sys.argv[1], sys.argv[2]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("ddp-spark-submit-smoke")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    # package imports resolve via the --py-files zip
    from database_delta_plugins_spark.sources.generator import write_event_log
    from database_delta_plugins_spark.streaming.pipeline import CDCPipeline

    n = write_event_log(spark, sf_dir, f"{work}/log", revs=2, n_files=2)
    pipe = CDCPipeline(
        spark, f"{work}/log", f"{work}/table", f"{work}/ckpt",
        num_buckets=4, derive_text_from_html=False,
    )
    t = pipe.run_to_completion()
    rows = t.read().count()
    applied = sum(r.get("rows_applied", 0) for r in pipe.epoch_lineage)
    print(f"SUBMIT_OK events={n} applied={applied} rows={rows} "
          f"version={t.version}")
    spark.stop()


if __name__ == "__main__":
    main()
