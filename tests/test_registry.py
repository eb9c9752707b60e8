from pyspark.sql import types as T

from database_delta_plugins_spark.sources.registry import (
    NO,
    PARTIAL,
    YES,
    assess_schema,
    describe_table,
    list_tables,
)
from database_delta_plugins_spark.streaming.pipeline import PAGES_SCHEMA


def test_assess_pages_schema():
    a = assess_schema("pages", PAGES_SCHEMA, key="url")
    assert a.ok
    verdicts = {c.name: c.verdict for c in a.columns}
    assert verdicts["html"] == YES and verdicts["url"] == YES
    assert verdicts["warc_ts"] == PARTIAL  # micros truncation, like DATETIME2(7)


def test_assess_rejects_bad_key():
    s = T.StructType([T.StructField("url", T.StringType(), True)])
    a = assess_schema("t", s, key="url")
    assert not a.ok and "non-nullable" in a.problems[0]
    a2 = assess_schema("t", s, key="missing")
    assert not a2.ok


def test_assess_unsupported_type():
    s = T.StructType([T.StructField("iv", T.CalendarIntervalType(), True)])
    assert assess_schema("t", s).columns[0].verdict == NO


def test_registry_lists_parquet_and_laketables(spark, sf_dir, tmp_path):
    names = list_tables(spark, sf_dir)
    assert "documents" in names and "lineitem" in names
    d = describe_table(spark, sf_dir, "documents")
    assert d["format"] == "parquet" and "doc_id" in d["columns"]

    from database_delta_plugins_spark.lake.table import LakeTable
    LakeTable.create(spark, str(tmp_path / "pages"), PAGES_SCHEMA, key="url")
    names2 = list_tables(spark, str(tmp_path))
    assert names2 == ["pages"]
    d2 = describe_table(spark, str(tmp_path), "pages")
    assert d2["format"] == "laketable" and d2["key"] == "url"


def test_create_database_revives_dropped(tmp_path, spark):
    from database_delta_plugins_spark.sources import registry

    root = str(tmp_path)
    registry.create_database(root, "db1")
    registry.drop_database(root, "db1")
    registry.create_database(root, "db1")
    import os
    assert not os.path.exists(os.path.join(root, "db1", "_DROPPED"))


def test_assess_schema_recurses_containers(spark):
    from pyspark.sql import types as T

    from database_delta_plugins_spark.sources.registry import assess_schema

    s = T.StructType([
        T.StructField("ok", T.ArrayType(T.StringType())),
        T.StructField("bad", T.ArrayType(T.CalendarIntervalType())),
        T.StructField("bad2", T.StructType(
            [T.StructField("x", T.CalendarIntervalType())])),
    ])
    a = assess_schema("t", s)
    verdicts = {c.name: c.verdict for c in a.columns}
    assert verdicts["ok"] == "YES"
    assert verdicts["bad"] == "NO" and verdicts["bad2"] == "NO"
