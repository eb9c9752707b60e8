"""Byte-identity invariant for the vectorized transforms (BASELINE.json:15
'byte-identical extracted text per url') — the engine analogue of the
reference's charset-discipline (MySqlValueConverters.java:381-399)."""
import pandas as pd
from pyspark.sql import functions as F

from database_delta_plugins_spark.functions.udfs import extract_text, norm_lang, synth_html

EDGE_TEXTS = [
    "plain words",
    "a < b && b > c",            # escaping round-trip
    "unicode: héllo wörld — 中文 🚀",
    "&amp; pre-escaped looking",
    "",                           # empty
    " leading and trailing ",
    "tags <not> really </not>",   # angle brackets must survive
    None,                         # null
]


def test_roundtrip_byte_identity(spark):
    df = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(EDGE_TEXTS)], ["id", "text", "lang"]
    )
    out = (
        df.withColumn("html", synth_html(F.col("text"), F.col("lang")))
        .withColumn("rt", extract_text(F.col("html")))
        .select("id", "text", "rt")
        .orderBy("id")
        .collect()
    )
    for r in out:
        assert r["rt"] == r["text"], (r["id"], r["text"], r["rt"])


def test_roundtrip_on_corpus(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bad = (
        d.withColumn("html", synth_html(F.col("text"), F.col("lang")))
        .withColumn("rt", extract_text(F.col("html")))
        .filter(~F.col("rt").eqNullSafe(F.col("text")))
        .count()
    )
    assert bad == 0


def test_html_is_binary_utf8(spark):
    df = spark.createDataFrame([("héllo", "fr")], ["text", "lang"])
    row = df.select(synth_html(F.col("text"), F.col("lang")).alias("h")).head()
    assert isinstance(row["h"], (bytes, bytearray))
    assert b'lang="fr"' in row["h"]
    assert "héllo".encode("utf-8") in row["h"]


def test_padded_roundtrip_byte_identity(spark):
    """Page-weight padding (realistic CC page sizes) must strip to zero
    bytes: extract_text(synth_html_padded(t)) == t for any pad."""
    from database_delta_plugins_spark.functions.udfs import make_synth_html

    synth8k = make_synth_html(8192)
    df = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(EDGE_TEXTS) if t is not None],
        ["id", "text", "lang"],
    )
    out = (
        df.withColumn("html", synth8k(F.col("text"), F.col("lang")))
        .withColumn("rt", extract_text(F.col("html")))
        .collect()
    )
    for r in out:
        assert r["rt"] == r["text"]
        assert len(r["html"]) >= 8192


def test_norm_lang(spark):
    cases = [("EN-us", "en"), ("deu", "de"), (" French ", "fr"),
             ("zh-CN", "zh"), ("klingon", "und"), (None, "und")]
    df = spark.createDataFrame([(i, c) for i, (c, _) in enumerate(cases)], ["i", "lang"])
    got = {r["i"]: r["n"] for r in df.select("i", norm_lang(F.col("lang")).alias("n")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want
