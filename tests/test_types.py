"""Value-conversion semantics mirroring the reference's converter tests
(RecordsTest.java:35-72 and MySqlValueConverters rules)."""
import datetime

from pyspark.sql import functions as F

from database_delta_plugins_spark.functions.types import (
    adjust_two_digit_year,
    decode_enum,
    decode_set,
    json_canonical,
    make_charset_decoder,
    time_over_24h_micros,
    widen_unsigned,
    zero_date_to_null,
)


def test_two_digit_year(spark):
    # 00-69 -> +2000, 70-99 -> +1900 (MySqlEventReader.java:215-225)
    rows = [(datetime.date(69, 5, 1),), (datetime.date(70, 5, 1),),
            (datetime.date(5, 12, 31),), (datetime.date(1999, 1, 1),)]
    df = spark.createDataFrame(rows, ["d"])
    got = [r["y"] for r in df.select(F.year(adjust_two_digit_year(F.col("d"))).alias("y"))
           .collect()]
    assert got == [2069, 1970, 2005, 1999]


def test_zero_date_null(spark):
    rows = [("0000-00-00",), ("0000-00-00 00:00:00",), ("2024-01-01",), (None,)]
    df = spark.createDataFrame(rows, ["s"])
    got = [r["o"] for r in df.select(zero_date_to_null(F.col("s")).alias("o")).collect()]
    assert got == [None, None, "2024-01-01", None]


def test_unsigned_widening(spark):
    # tinyint->int … bigint->decimal(20,0) (MySqlValueConverters.java:270-300)
    from decimal import Decimal

    df = spark.createDataFrame([(255, 65535, 4294967295, Decimal(18446744073709551615))],
                               "a long, b long, c long, d decimal(20,0)")
    out = df.select(
        widen_unsigned(F.col("a"), "tinyint").alias("a"),
        widen_unsigned(F.col("b"), "smallint").alias("b"),
        widen_unsigned(F.col("c"), "int").alias("c"),
        widen_unsigned(F.col("d"), "bigint").alias("d"),
    )
    types = dict(out.dtypes)
    assert types == {"a": "int", "b": "int", "c": "bigint", "d": "decimal(20,0)"}
    r = out.head()
    assert r["c"] == 4294967295 and int(r["d"]) == 18446744073709551615


def test_enum_set_decode(spark):
    labels = ["red", "green", "blue"]
    df = spark.createDataFrame([(0, 0), (1, 1), (3, 5), (9, 7)], ["e", "m"])
    out = df.select(
        decode_enum(F.col("e"), labels).alias("e"),
        decode_set(F.col("m"), labels).alias("m"),
    ).collect()
    # ENUM: 0 -> '', 1-based label, out of range -> null
    assert [r["e"] for r in out] == ["", "red", "blue", None]
    # SET: bitmask -> comma-joined labels
    assert [r["m"] for r in out] == ["", "red", "red,blue", "red,green,blue"]


def test_time_over_24h(spark):
    df = spark.createDataFrame([(25, 30, 0)], ["h", "m", "s"])
    got = df.select(time_over_24h_micros(F.col("h"), F.col("m"), F.col("s")).alias("us")).head()
    assert got["us"] == (25 * 3600 + 30 * 60) * 1_000_000


def test_json_canonical(spark):
    rows = [('{"b":1, "a": 2}',), ("",), (None,), ("not json",)]
    df = spark.createDataFrame(rows, ["j"])
    got = [r["o"] for r in df.select(json_canonical(F.col("j")).alias("o")).collect()]
    assert got == ['{"a":2,"b":1}', "{}", None, None]


def test_charset_decode_with_fallback(spark):
    latin1 = make_charset_decoder("latin-1")
    rows = [(b"caf\xe9",), (None,)]
    df = spark.createDataFrame(rows, "b binary")
    got = [r["o"] for r in df.select(latin1(F.col("b")).alias("o")).collect()]
    assert got == ["café", None]
    # bogus charset falls back to utf-8 replace
    bogus = make_charset_decoder("not-a-charset")
    got2 = df.select(bogus(F.col("b")).alias("o")).collect()[0]["o"]
    assert got2 == "caf�"


def test_binary_handling_modes(spark):
    """F6 binarycoltable: binary(16) under bytes/hex/base64 handling —
    hex/base64 change the emitted type to string (config-driven schema
    variation, MySqlEventReaderIntegrationTest.java:279-303)."""
    import base64

    from pyspark.sql import functions as F

    from database_delta_plugins_spark.functions.types import binary_handling

    payload = bytes(range(16))
    df = spark.createDataFrame([(1, payload)], "id int, bincol binary")
    out = df.select(
        binary_handling(F.col("bincol"), "bytes").alias("b"),
        binary_handling(F.col("bincol"), "hex").alias("h"),
        binary_handling(F.col("bincol"), "base64").alias("b64"),
    )
    assert dict(out.dtypes) == {"b": "binary", "h": "string", "b64": "string"}
    r = out.head()
    assert bytes(r["b"]) == payload
    assert r["h"] == payload.hex()
    assert base64.b64decode(r["b64"]) == payload


def test_widen_unsigned_reinterprets_negatives(spark):
    """review r3: unsigned widening must reinterpret two's-complement
    negatives (TINYINT UNSIGNED 255 arrives as signed -1)."""
    from pyspark.sql import types as T

    from database_delta_plugins_spark.functions.types import widen_unsigned

    df = spark.createDataFrame(
        [(-1, -1, -1, -1), (5, 5, 5, 5)],
        T.StructType([
            T.StructField("b", T.ByteType()),
            T.StructField("s", T.ShortType()),
            T.StructField("i", T.IntegerType()),
            T.StructField("l", T.LongType()),
        ]))
    got = df.select(
        widen_unsigned(F.col("b"), "tinyint").alias("b"),
        widen_unsigned(F.col("s"), "smallint").alias("s"),
        widen_unsigned(F.col("i"), "int").alias("i"),
        widen_unsigned(F.col("l"), "bigint").cast("string").alias("l"),
    ).collect()
    assert (got[0]["b"], got[0]["s"], got[0]["i"], got[0]["l"]) == (
        255, 65535, 4294967295, "18446744073709551615")
    assert (got[1]["b"], got[1]["s"], got[1]["i"], got[1]["l"]) == (
        5, 5, 5, "5")


def test_decode_set_null_mask_stays_null(spark):
    from database_delta_plugins_spark.functions.types import decode_set

    df = spark.createDataFrame([(None,), (0,), (3,)], "m: long")
    got = [r["s"] for r in df.select(
        decode_set(F.col("m"), ["a", "b"]).alias("s")).collect()]
    assert got == [None, "", "a,b"]
