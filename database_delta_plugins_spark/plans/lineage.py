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


def batch_audit_fast(batch_df: DataFrame) -> tuple[list[dict], list[tuple[int, str, str | None]]] | None:
    """Manifest-style epoch audit: per-input-FILE offset-range lineage
    read from parquet FOOTERS (rows + lsn min/max — zero data scan, the
    Iceberg-manifest shape of per-partition lineage; the input file is
    the binlog-file analogue, so "partition" here is the most faithful
    audit unit), plus two O(~0) probe jobs:

    * DDL rows via a ``ddl IS NOT NULL`` pushdown scan — row groups whose
      ddl chunk is all-null (i.e. nearly all of them) are skipped on
      footer stats alone;
    * per-partition unknown-op counts via a dictionary-filtered scan of
      (op, lsn) only.

    Measured vs the one-job full scan (batch_audit): 0.6 s vs 2.6 s per
    1.44M-event epoch at local[8] — per-epoch fixed job cost is what
    bounds streaming throughput. Returns None when the batch is not
    file-backed (constructed DataFrames in tests) — caller falls back to
    batch_audit.

    Semantics note: footer-derived per-file rows/lsn ranges INCLUDE any
    DDL control rows in the file (the binlog-file analogue also counts
    control events in its ranges); batch_audit's scan-based rows exclude
    them. The difference is at most the batch's DDL count and only
    matters for batches carrying DDL, whose segments re-aggregate
    per-segment lineage anyway (CDCPipeline._grouped_segment_lineage)."""
    import pyarrow.parquet as pq

    files = sorted(batch_df.inputFiles())
    if not files:
        return None

    def _footer(f: str):
        path = f[7:] if f.startswith("file:///") else f
        path = "/" + path.lstrip("/")
        md = pq.ParquetFile(path).metadata
        mn = mx = None
        for rg in range(md.num_row_groups):
            rgm = md.row_group(rg)
            for ci in range(rgm.num_columns):
                c = rgm.column(ci)
                if c.path_in_schema == "lsn" and c.statistics is not None \
                        and c.statistics.has_min_max:
                    s = c.statistics
                    mn = s.min if mn is None else min(mn, s.min)
                    mx = s.max if mx is None else max(mx, s.max)
        return path, md.num_rows, mn, mx

    # footer fetches run CONCURRENTLY (r6): this is per-epoch driver-
    # serial time (32 files/epoch at bench trigger sizes; ~50-100 ms/GET
    # on an object store) — a thread pool makes it one round-trip deep,
    # the same trade as LakeTable._prefetch_manifests.
    try:
        if len(files) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
                footers = list(ex.map(_footer, files))
        else:
            footers = [_footer(f) for f in files]
    except (OSError, ValueError):
        return None
    lineage = []
    for i, (path, rows, mn, mx) in enumerate(footers):
        lineage.append({"partition": i, "file": path.rsplit("/", 1)[-1],
                        "rows": rows, "min_lsn": mn, "max_lsn": mx,
                        "unknown_ops": 0})

    # ONE probe job for both control-row kinds. The disjunctive filter
    # still prunes on footer stats for the common all-DML batch: the ddl
    # chunk is all-null and op's dictionary is {c,r,u,d}, so row groups
    # are skipped without decoding. Null-safe: op=NULL (malformed
    # record) must surface as unknown, not vanish under three-valued
    # logic — both disjuncts remain pushable predicates.
    is_ddl = F.col("ddl").isNotNull()
    unknown_op = F.col("op").isNull() | ~F.col("op").isin("c", "r", "u", "d", "ddl")
    probe = (
        batch_df.filter(is_ddl | unknown_op)
        .groupBy(F.spark_partition_id().alias("partition"))
        .agg(
            F.sum(unknown_op.cast("long")).alias("unknown"),
            F.collect_list(
                F.when(is_ddl, F.struct("lsn", "ddl", "table_name"))
            ).alias("ddls"),
        )
        .collect()
    )
    ddls: list[tuple[int, str, str | None]] = []
    for r in probe:
        # scan partitions pack multiple files, so unknown-op counts can't
        # be attributed to one file — record them as their own audit rows.
        if r["unknown"]:
            lineage.append({"partition": int(r["partition"]),
                            "scan_partition": True, "rows": 0,
                            "min_lsn": None, "max_lsn": None,
                            "unknown_ops": int(r["unknown"])})
        for d in r["ddls"]:
            ddls.append((int(d["lsn"]), d["ddl"], d["table_name"]))
    return lineage, sorted(ddls, key=lambda x: x[0])


def batch_audit(batch_df: DataFrame
                ) -> tuple[list[dict], list[tuple[int, str, str | None]]]:
    """ONE narrow agg job producing everything the per-epoch driver logic
    needs from the raw batch: per-input-partition offset-range lineage,
    the unknown-op drop count, and the batch's DDL control rows.

    Replaces three separate scans per epoch (ddl collect + lineage agg +
    unknown count) — per-epoch fixed job cost is what bounds streaming
    throughput at high parallelism. Column pruning reaches the scan: only
    (op, lsn, ddl) bytes are read, never the page payloads.

    Returns (partition_lineage_rows,
             [(lsn, ddl_json, table_name), ...] sorted by lsn).
    Null-safe op handling: a NULL op row counts as a DML row with an
    unknown op (matching split_ddl/map_opcode), never a silent drop.
    """
    is_ddl = F.col("op").eqNullSafe("ddl")
    known = F.col("op").isNotNull() & F.col("op").isin("c", "r", "u", "d")
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
