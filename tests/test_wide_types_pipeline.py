"""FIXTURES F4/F5 end-to-end: a WIDE-typed payload (the mysql/sqlserver
type-coverage fixtures' Spark-mapped shapes) through the full streaming
pipeline — proves the engine is payload-schema-generic, not hardwired to
the pages shape, and that every supported type round-trips the
decode -> LWW -> merge-on-read -> scan path losslessly.

Reference type matrices:
mysql-delta-plugins/src/e2e-test/resources/pluginParameters.properties:28-33
sqlserver-delta-plugins/src/e2e-test/resources/pluginParameters.properties:27-31
(Spark mapping per SURVEY.md §1.2: unsigned widened one size, enum/set/
json as string, blobs as binary, money as decimal.)
"""
import datetime
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_delta_plugins_spark.lake.table import LakeTable
from database_delta_plugins_spark.sources.registry import assess_schema
from database_delta_plugins_spark.streaming.pipeline import CDCPipeline, event_envelope_schema

WIDE = T.StructType([
    T.StructField("id", T.StringType(), False),          # varchar PK
    T.StructField("c_bigint", T.LongType(), True),
    T.StructField("c_bigint_uns", T.DecimalType(20, 0), True),  # unsigned widen
    T.StructField("c_binary", T.BinaryType(), True),
    T.StructField("c_bit", T.BooleanType(), True),
    T.StructField("c_tinyint", T.IntegerType(), True),   # unsigned widen
    T.StructField("c_char", T.StringType(), True),
    T.StructField("c_date", T.DateType(), True),
    T.StructField("c_datetime", T.TimestampType(), True),
    T.StructField("c_decimal", T.DecimalType(10, 0), True),
    T.StructField("c_money", T.DecimalType(19, 4), True),
    T.StructField("c_double", T.DoubleType(), True),
    T.StructField("c_enum", T.StringType(), True),
    T.StructField("c_float", T.FloatType(), True),
    T.StructField("c_int", T.IntegerType(), True),
    T.StructField("c_json", T.StringType(), True),
    T.StructField("c_set", T.StringType(), True),
    T.StructField("c_smallint", T.ShortType(), True),
    T.StructField("c_text", T.StringType(), True),
    T.StructField("c_time_us", T.LongType(), True),      # TIME as micros (>24h ok)
])


def _row(i: int, rev: int):
    return (
        f"k{i}", 2**40 + i, Decimal(2**63 + i), bytes([i % 256] * 4), i % 2 == 0,
        200 + i, f"ch{i}", datetime.date(2024, 1, 1 + i % 27),
        datetime.datetime(2024, 1, 1, 12, 0, i % 60), Decimal(i),
        Decimal(f"{i}.2500"), i * 1.5, "GREEN", float(i) / 4, i,
        f'{{"a": {i}}}', "a,b", i % 1000, f"text {i} rev {rev}", (25 * 3600 + i) * 1_000_000,
    )


def _events(spark, n=12):
    rows = []
    for i in range(n):
        payload0 = _row(i, 0)
        rows.append((i * 4, 0, "c", "wide", None, payload0, 1704067200000 + i, False, f"t{i}", None))
        if i % 3 == 0:  # update with a rev-1 image
            rows.append((i * 4 + 1, 0, "u", "wide", payload0, _row(i, 1),
                         1704067201000 + i, False, f"t{i}u", None))
        if i % 5 == 4:  # delete
            rows.append((i * 4 + 2, 0, "d", "wide", _row(i, 1 if i % 3 == 0 else 0),
                         None, 1704067202000 + i, False, f"t{i}d", None))
    return spark.createDataFrame(rows, event_envelope_schema(WIDE))


def test_wide_types_assessed_supported():
    a = assess_schema("wide", WIDE, key="id")
    assert a.ok, a.problems
    assert all(c.verdict in ("YES", "PARTIAL") for c in a.columns)


def test_wide_types_pipeline_roundtrip(spark, tmp_path):
    log = str(tmp_path / "widelog")
    ev = _events(spark)
    ev.repartitionByRange(2, "lsn").write.parquet(log)
    p = CDCPipeline(spark, log, str(tmp_path / "wt"), str(tmp_path / "wc"),
                    key="id", num_buckets=4, payload_schema=WIDE)
    t = p.run_to_completion()
    got = {r["id"]: r for r in t.read().collect()}
    # deletes removed (i=4 and i=9: i%5==4)
    assert "k4" not in got and "k9" not in got
    assert len(got) == 10
    # LWW winner per key: updated keys carry the rev-1 image
    assert got["k0"]["c_text"] == "text 0 rev 1"
    assert got["k1"]["c_text"] == "text 1 rev 0"
    # value-lossless round-trip across every type
    r = got["k3"]
    exp = dict(zip([f.name for f in WIDE.fields], _row(3, 1)))
    assert r["c_bigint"] == exp["c_bigint"]
    assert r["c_bigint_uns"] == exp["c_bigint_uns"]
    assert bytes(r["c_binary"]) == exp["c_binary"]
    assert r["c_bit"] == exp["c_bit"]
    assert r["c_date"] == exp["c_date"]
    assert r["c_datetime"] == exp["c_datetime"]
    assert r["c_decimal"] == exp["c_decimal"]
    assert r["c_money"] == exp["c_money"]
    assert r["c_double"] == exp["c_double"]
    assert abs(r["c_float"] - exp["c_float"]) < 1e-6
    assert r["c_json"] == exp["c_json"]
    assert r["c_time_us"] == exp["c_time_us"]  # 25h TIME survives as micros
    # schema evolution on the wide table too: widen + rename
    assert t.apply_ddl({"action": "widen_column", "name": "c_int", "type": "bigint"}, lsn=10_000)
    t = t.refresh()
    assert t.apply_ddl({"action": "rename_column", "name": "c_enum", "new_name": "c_color"}, lsn=10_001)
    t = t.refresh()
    out = t.read()
    assert dict(out.dtypes)["c_int"] == "bigint"
    assert "c_color" in out.columns and "c_enum" not in out.columns
