"""Event decode / normalize operators (SURVEY.md §2.2 D1-D12).

Each stage of the reference's per-record consumer pipeline
(mysql-delta-plugins/src/main/java/io/cdap/delta/mysql/
MySqlRecordConsumer.java:78-225) re-expressed as pure Catalyst column
expressions over the event DataFrame — whole-stage-codegen friendly,
no Python in the path. All functions take and return DataFrames so
they compose; Catalyst fuses the stack into one projection/filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# D2: op-code map — c/r -> INSERT, u -> UPDATE, d -> DELETE; unknown dropped
# with the reference's skip-and-warn semantics (MySqlRecordConsumer.java:170-183).
_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def split_ddl(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """D1 envelope split: (dml_df, ddl_df). DDL records are control rows
    with op='ddl' (reference distinguishes by record layout:
    MySqlRecordConsumer.java:142-154). Null-safe: a malformed record
    with op=NULL routes to the DML side where it is COUNTED as an
    unknown-op drop (a plain op != 'ddl' filter would discard it
    silently, unaudited)."""
    is_ddl = F.col("op").eqNullSafe("ddl")
    return df.filter(~is_ddl), df.filter(is_ddl)


def op_type_expr(op_col: str = "op") -> Column:
    """The op-code normalization as a reusable COLUMN (c/r -> I, u -> U,
    d -> D, anything else null) — the single source of the D2 map;
    consumed by map_opcode and the pipeline's folded lineage agg so the
    two can never diverge."""
    return (F.when(F.col(op_col).isin("c", "r"), F.lit("I"))
            .when(F.col(op_col) == "u", F.lit("U"))
            .when(F.col(op_col) == "d", F.lit("D")))


def map_opcode(df: DataFrame, op_col: str = "op", out_col: str = "op_type",
               drop_unknown: bool = True) -> DataFrame:
    """D2: normalize source op codes; unknown codes are dropped (skip+warn
    in the reference, MySqlRecordConsumer.java:170-183). With
    ``drop_unknown=False`` unknown rows survive with a null ``out_col`` so
    the caller can COUNT them into lineage before filtering (the pipeline
    does: see CDCPipeline.apply_batch's events_skipped_unknown_op)."""
    out = df.withColumn(out_col, op_type_expr(op_col))
    return out.filter(F.col(out_col).isNotNull()) if drop_unknown else out


def select_row_image(df: DataFrame, before_key_only: str | None = None) -> DataFrame:
    """D3: DELETE carries the before-image as its row; INSERT/UPDATE the
    after-image (MySqlRecordConsumer.java:218-225; SqlServerRecordConsumer.java:216-218).
    Produces a unified ``row`` struct plus retained ``before`` for UPDATE
    validation.

    ``before_key_only``: the apply path only ever needs the KEY of the
    before-image (deletes tombstone the payload anyway), so passing the
    key column name here builds the row image from after.* plus
    coalesce(after.key, before.key) — nested-schema pruning then drops
    the wide before payload (html!) from the parquet scan entirely,
    halving payload I/O at the source."""
    if before_key_only is None:
        return df.withColumn("row", F.coalesce(F.col("after"), F.col("before")))
    key = before_key_only
    fields = df.schema["after"].dataType.names
    row = F.struct(*[
        (F.coalesce(F.col(f"after.{f}"), F.col(f"before.{f}")) if f == key
         else F.col(f"after.{f}")).alias(f)
        for f in fields
    ])
    return df.withColumn("row", row)


def filter_dml_blacklist(df: DataFrame, blacklist: set[str] | None, op_col: str = "op_type") -> DataFrame:
    """D7: drop blacklisted operation types (MySqlRecordConsumer.java:185-188)."""
    if not blacklist:
        return df
    # null-safe: unknown-op rows (null op_type under keep_unknown) are not
    # the blacklist's business — they pass through to be counted, then dropped.
    return df.filter(
        F.col(op_col).isNull() | ~F.col(op_col).isin(*sorted(blacklist))
    )


def synth_txn_id(df: DataFrame, gtid_col: str = "gtid",
                 file_col: str = "binlog_file", pos_col: str = "binlog_pos") -> DataFrame:
    """D9: transaction id = gtid, else file:pos (MySqlRecordConsumer.java:190-195)."""
    return df.withColumn(
        "txn_id",
        F.coalesce(F.col(gtid_col),
                   F.concat_ws(":", F.col(file_col), F.col(pos_col).cast("string"))),
    )


def filter_replayed(df: DataFrame, last_committed_lsn: int | None,
                    lsn_col: str = "lsn") -> DataFrame:
    """D11: drop events at-or-before the committed offset after a restart —
    the source replays the boundary event (SqlServerRecordConsumer.java:88-97,
    SqlServerOffset.java:91-94 isBeforeOrAt). Belt-and-braces with the
    idempotent MERGE."""
    if last_committed_lsn is None:
        return df
    return df.filter(F.col(lsn_col) > F.lit(int(last_committed_lsn)))


def project_columns(df: DataFrame, columns: list[str] | None,
                    row_col: str = "row") -> DataFrame:
    """D6: keep only user-selected payload columns of the row image
    (common/Records.java:123-148). Column pruning then reaches the scan."""
    if not columns:
        return df
    pruned = F.struct(*[F.col(f"{row_col}.{c}").alias(c) for c in columns])
    return df.withColumn(row_col, pruned)


def offset_columns(df: DataFrame) -> DataFrame:
    """D10: carry the source offset through the pipeline as first-class
    columns (lsn, seq) — per-partition min/max becomes lineage
    (MySqlRecordConsumer.java:369-399 offset map)."""
    return df.withColumn("_offset", F.struct(F.col("lsn"), F.col("seq")))


def decode_events(
    df: DataFrame,
    blacklist: set[str] | None = None,
    last_committed_lsn: int | None = None,
    columns: list[str] | None = None,
    before_key_only: str | None = None,
    keep_unknown: bool = False,
) -> DataFrame:
    """Full DML decode stack D1-D12 (DDL rows excluded; handle via split_ddl).

    Output: flattened payload columns + (op_type, lsn, seq, ts_ms,
    is_snapshot, txn_id). One Catalyst projection — verify with
    .explain(): a single WholeStageCodegen span over the scan.
    ``before_key_only``/``keep_unknown`` pass through to
    select_row_image / map_opcode (apply-path options).
    """
    dml, _ = split_ddl(df)
    dml = filter_replayed(dml, last_committed_lsn)
    dml = map_opcode(dml, drop_unknown=not keep_unknown)
    dml = filter_dml_blacklist(dml, blacklist)
    dml = select_row_image(dml, before_key_only=before_key_only)
    dml = project_columns(dml, columns)
    return dml.select(
        F.col("row.*"),
        "op_type", "lsn", "seq", "ts_ms", "is_snapshot", "txn_id",
    )
