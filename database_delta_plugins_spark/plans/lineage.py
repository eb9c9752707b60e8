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
