"""F3 reference-parity fixture: the reference's integration test seeds
customers(id int PK, name varchar NOT NULL, bday date NULL) with 3 rows
and asserts the emitted event sequence — DDL then 3 snapshot INSERTs
with exact typed values (MySqlEventReaderIntegrationTest.java:117-245).

We mirror it end-to-end: the same snapshot events flow through a
CDCPipeline bound to the customers payload schema (the engine is
payload-generic, not hardcoded to web pages), then CDC ops replay on
top, and the final table matches a row-wise oracle — the analogue of
the reference's BQValidation source-vs-target comparison."""
import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_delta_plugins_spark.streaming.pipeline import CDCPipeline, event_envelope_schema

CUSTOMERS = T.StructType([
    T.StructField("id", T.IntegerType(), False),
    T.StructField("name", T.StringType(), False),
    T.StructField("bday", T.DateType(), True),
])

ROWS = [
    (0, "alice", datetime.date(1970, 1, 1)),
    (1, "bob", datetime.date(1971, 1, 1)),
    (2, "tim", None),
]


def _ev(lsn, seq, op, before, after, snap):
    return (lsn, seq, op, "customers", before, after,
            1704067200000 + lsn, snap, f"tx:{lsn}", None)


def test_customers_replication(spark, tmp_path):
    env = event_envelope_schema(CUSTOMERS)
    # snapshot phase: 3 'r' events sharing the snapshot flag
    events = [_ev(i, 0, "r", None, r, True) for i, r in enumerate(ROWS)]
    # tail phase: update bob's bday, insert dana, delete alice
    events += [
        _ev(10, 0, "u", ROWS[1], (1, "bob", datetime.date(1999, 9, 9)), False),
        _ev(11, 0, "c", None, (3, "dana", None), False),
        _ev(12, 0, "d", ROWS[0], None, False),
    ]
    df = spark.createDataFrame(events, env)

    p = CDCPipeline(
        spark, str(tmp_path / "log"), str(tmp_path / "t"), str(tmp_path / "c"),
        key="id", num_buckets=2, payload_schema=CUSTOMERS,
    )
    t = p.apply_log_batch(df)

    got = {r["id"]: (r["name"], r["bday"]) for r in t.read().collect()}
    assert got == {
        1: ("bob", datetime.date(1999, 9, 9)),
        2: ("tim", None),
        3: ("dana", None),
    }
    # typed schema survived end-to-end
    assert dict(t.read().dtypes) == {"id": "int", "name": "string", "bday": "date"}
    # snapshot rows were flagged (D12) and the delete left a tombstone
    assert t.scan().filter(F.col("_is_deleted")).count() == 1
