"""Table registry + assessment (SURVEY.md §2.1 S4, §2.5 C6).

The reference lists/describes source tables via JDBC metadata and
renders a per-column support verdict YES/PARTIAL/NO
(mysql/MySqlTableRegistry.java:57-133, mysql/MySqlTableAssessor.java:87-162,
sqlserver/SqlServerTableAssessor.java:59-171). Our sources are parquet
event logs and LakeTables; the registry introspects those, and
``assess_schema`` applies the same verdict taxonomy to Spark types.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from database_delta_plugins_spark.lake.table import LakeTable

YES, PARTIAL, NO = "YES", "PARTIAL", "NO"

# Verdict taxonomy mirroring the reference's assessors: every type our
# engine round-trips losslessly is YES; sub-second-beyond-micros
# precision is PARTIAL (reference: DATETIME2(7) truncated to micros,
# sqlserver/SqlServerTableAssessor.java:109-130); types with no Spark
# representation are NO (geometry/xml: SqlServerTableAssessor.java:136-161).
_YES_TYPES = (
    T.BooleanType, T.IntegerType, T.ShortType, T.ByteType, T.LongType,
    T.FloatType, T.DoubleType, T.StringType, T.BinaryType, T.DateType,
    T.TimestampType, T.TimestampNTZType, T.DecimalType,
    T.ArrayType, T.MapType, T.StructType,
)


@dataclass
class ColumnAssessment:
    name: str
    type: str
    verdict: str
    note: str = ""


@dataclass
class TableAssessment:
    table: str
    columns: list[ColumnAssessment] = field(default_factory=list)
    problems: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.problems and all(c.verdict != NO for c in self.columns)


def assess_schema(name: str, schema: T.StructType, key: str | None = None) -> TableAssessment:
    """Per-column support verdicts + table-level problems (the no-PK rule:
    reference throws on null key, SqlServerRecordConsumer.java:129-133)."""
    def _contains_unsupported(dt: T.DataType) -> bool:
        # containers of unsupported element types must not green-light
        # (array<interval>, map<k, interval>, struct{..interval..})
        if isinstance(dt, T.CalendarIntervalType):
            return True
        if isinstance(dt, T.ArrayType):
            return _contains_unsupported(dt.elementType)
        if isinstance(dt, T.MapType):
            return (_contains_unsupported(dt.keyType)
                    or _contains_unsupported(dt.valueType))
        if isinstance(dt, T.StructType):
            return any(_contains_unsupported(f.dataType) for f in dt.fields)
        return False

    out = TableAssessment(table=name)
    for f in schema.fields:
        if _contains_unsupported(f.dataType):
            out.columns.append(ColumnAssessment(f.name, f.dataType.simpleString(), NO,
                                                "interval has no stable storage form"))
        elif isinstance(f.dataType, _YES_TYPES):
            note = ""
            v = YES
            if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
                v, note = PARTIAL, "sub-microsecond precision truncated to micros"
            out.columns.append(ColumnAssessment(f.name, f.dataType.simpleString(), v, note))
        else:
            out.columns.append(ColumnAssessment(f.name, f.dataType.simpleString(), NO,
                                                "unsupported type"))
    if key is not None:
        kf = next((f for f in schema.fields if f.name == key), None)
        if kf is None:
            out.problems.append(f"primary key column {key!r} missing")
        elif kf.nullable:
            out.problems.append(f"primary key column {key!r} must be non-nullable")
    return out


def list_tables(spark: SparkSession, root: str) -> list[str]:
    """Registry scan over a directory of parquet tables and/or LakeTables
    (the JDBC getTables analogue)."""
    if os.path.exists(os.path.join(root, "_DROPPED")):
        return []  # dropped namespace (see drop_database)
    names = []
    for entry in sorted(os.listdir(root)):
        p = os.path.join(root, entry)
        if entry.endswith(".parquet"):
            names.append(entry[: -len(".parquet")])
        elif os.path.isdir(p) and LakeTable.exists(p):
            names.append(entry)
    return names


def describe_table(spark: SparkSession, root: str, name: str) -> dict:
    """describeTable analogue: schema + (for LakeTables) key/buckets/version."""
    p_parquet = os.path.join(root, f"{name}.parquet")
    p_lake = os.path.join(root, name)
    if os.path.exists(p_parquet):
        schema = spark.read.parquet(p_parquet).schema
        return {"name": name, "format": "parquet", "schema": schema.json(),
                "columns": [f.name for f in schema.fields]}
    if LakeTable.exists(p_lake):
        t = LakeTable.load(spark, p_lake)
        return {
            "name": name, "format": "laketable", "schema": t.schema().json(),
            "columns": [f.name for f in t.schema().fields],
            "key": t.key, "num_buckets": t.num_buckets, "version": t.version,
        }
    raise FileNotFoundError(name)


def create_database(root: str, name: str) -> str:
    """DD4 database-scope op: a database is a directory of tables under
    ``root`` (the catalog namespace analogue; reference emits
    CREATE_DATABASE ops, mysql/MySqlRecordConsumer.java:270-283).
    Idempotent; REVIVES a previously dropped database (the drop
    tombstone is cleared — a legal CDC drop-then-create sequence must
    not leave the namespace permanently invisible)."""
    p = os.path.join(root, name)
    os.makedirs(p, exist_ok=True)
    tomb = os.path.join(p, "_DROPPED")
    if os.path.exists(tomb):
        os.remove(tomb)
    return p


def drop_database(root: str, name: str) -> list[str]:
    """Drop a database namespace: every contained LakeTable is marked
    dropped via its own transactional drop_table DDL (data manifests
    cleared, metadata retained for time travel) and the namespace is
    tombstoned. Returns the dropped table names."""
    p = os.path.join(root, name)
    if not os.path.isdir(p):
        return []
    dropped = []
    for entry in sorted(os.listdir(p)):
        tp = os.path.join(p, entry)
        if os.path.isdir(tp) and LakeTable.exists(tp):
            t = LakeTable.load(None, tp)  # metadata-only; no session needed
            if not t.is_dropped:
                t.apply_ddl({"action": "drop_table"})
            dropped.append(entry)
    with open(os.path.join(p, "_DROPPED"), "w") as f:
        f.write("")
    return dropped
