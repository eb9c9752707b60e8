"""Per-partition lineage (north rule: 'per-partition lineage + metrics').

The reference tracks one offset map per record (D10,
mysql/MySqlRecordConsumer.java:369-399); under Spark parallelism the
equivalent audit unit is the input partition: each partition reports its
source-offset range and row count, collected once per epoch and stored
in the epoch's commit record inside the table snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_lineage(df: DataFrame, lsn_col: str = "lsn",
                      op_col: str | None = None) -> list[dict]:
    """[{partition, rows, min_lsn, max_lsn[, unknown_ops]}] for the batch.
    One narrow agg job (no shuffle of the data itself: spark_partition_id
    groups are map-side-combined; column pruning reaches the scan — only
    lsn [+ op] bytes are read).

    ``op_col``: when set, also counts rows whose op column is null —
    unknown source op codes kept by decode's keep_unknown so the drop is
    auditable (reference skip-and-warn: MySqlRecordConsumer.java:170-183).
    """
    if lsn_col not in df.columns:
        return []
    aggs = [
        F.count(F.lit(1)).alias("rows"),
        F.min(lsn_col).alias("min_lsn"),
        F.max(lsn_col).alias("max_lsn"),
    ]
    if op_col is not None and op_col in df.columns:
        aggs.append(F.sum(F.col(op_col).isNull().cast("long")).alias("unknown_ops"))
    rows = df.groupBy(F.spark_partition_id().alias("partition")).agg(*aggs).collect()
    out = []
    for r in sorted(rows, key=lambda r: r["partition"]):
        rec = {"partition": int(r["partition"]), "rows": int(r["rows"]),
               "min_lsn": int(r["min_lsn"]), "max_lsn": int(r["max_lsn"])}
        if "unknown_ops" in r.asDict():
            rec["unknown_ops"] = int(r["unknown_ops"])
        out.append(rec)
    return out


def batch_audit(batch_df: DataFrame) -> tuple[list[dict], list[tuple[int, str]]]:
    """ONE narrow agg job producing everything the per-epoch driver logic
    needs from the raw batch: per-input-partition offset-range lineage,
    the unknown-op drop count, and the batch's DDL control rows.

    Replaces three separate scans per epoch (ddl collect + lineage agg +
    unknown count) — per-epoch fixed job cost is what bounds streaming
    throughput at high parallelism. Column pruning reaches the scan: only
    (op, lsn, ddl) bytes are read, never the page payloads.

    Returns (partition_lineage_rows,
             [(lsn, ddl_json, table_name), ...] sorted by lsn).
    """
    is_ddl = F.col("op") == "ddl"
    known = F.col("op").isin("c", "r", "u", "d")
    rows = (
        batch_df.groupBy(F.spark_partition_id().alias("partition"))
        .agg(
            F.sum((~is_ddl).cast("long")).alias("rows"),
            F.min(F.when(~is_ddl, F.col("lsn"))).alias("min_lsn"),
            F.max(F.when(~is_ddl, F.col("lsn"))).alias("max_lsn"),
            F.sum((~is_ddl & ~known).cast("long")).alias("unknown_ops"),
            # collect_list skips nulls -> only ddl rows collected (rare)
            F.collect_list(
                F.when(is_ddl, F.struct("lsn", "ddl", "table_name"))
            ).alias("ddls"),
        )
        .collect()
    )
    lineage = []
    ddls: list[tuple[int, str, str | None]] = []
    for r in sorted(rows, key=lambda r: r["partition"]):
        if r["rows"]:
            lineage.append({
                "partition": int(r["partition"]), "rows": int(r["rows"]),
                "min_lsn": int(r["min_lsn"]), "max_lsn": int(r["max_lsn"]),
                "unknown_ops": int(r["unknown_ops"]),
            })
        for d in r["ddls"]:
            ddls.append((int(d["lsn"]), d["ddl"], d["table_name"]))
    return lineage, sorted(ddls, key=lambda x: x[0])
