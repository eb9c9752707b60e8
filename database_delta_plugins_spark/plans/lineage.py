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


def partition_lineage(df: DataFrame, lsn_col: str = "lsn") -> list[dict]:
    """[{partition, rows, min_lsn, max_lsn}] for the batch. One narrow
    agg job (no shuffle of the data itself: spark_partition_id groups are
    map-side-combined)."""
    if lsn_col not in df.columns:
        return []
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min(lsn_col).alias("min_lsn"),
            F.max(lsn_col).alias("max_lsn"),
        )
        .collect()
    )
    return [
        {"partition": int(r["partition"]), "rows": int(r["rows"]),
         "min_lsn": int(r["min_lsn"]), "max_lsn": int(r["max_lsn"])}
        for r in sorted(rows, key=lambda r: r["partition"])
    ]
