from pyspark.sql import functions as F

from database_delta_plugins_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame(
        [(0, "one two three"), (1, "  spaced   out  "), (2, "punct! only?? words"), (3, "")],
        ["id", "text"],
    )
    got = {r["id"]: r["n_tokens"] for r in token_count(df).collect()}
    assert got == {0: 3, 1: 2, 2: 3, 3: 0}


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog of the house"),
            (1, "der hund und die katze"),
            (2, "le chat et la maison"),
            (3, "xyzzy plugh"),
        ],
        ["id", "text"],
    )
    got = {r["id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got == {0: "en", 1: "de", 2: "fr", 3: "und"}


def test_quality_score_bounds(spark, sf_dir):
    d = quality_score(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    bad = d.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count()
    assert bad == 0
    row = d.filter(F.col("n_tokens") > 0).head()
    assert row["alpha_ratio"] > 0 and row["mean_word_len"] > 0


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame([(0, " ABC "), (1, "abc"), (2, "abd")], ["id", "text"])
    got = {r["id"]: r["fp"] for r in fingerprint(df).collect()}
    assert got[0] == got[1] != got[2]


def test_rolling_fingerprint_order_sensitive(spark):
    from database_delta_plugins_spark.operators.text import rolling_fingerprint

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta alpha"), (3, "alpha beta")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["rfp"] for r in rolling_fingerprint(df).collect()}
    assert got[1] == got[3]          # identical text -> identical hash
    assert got[1] != got[2]          # word order matters (md5-of-set wouldn't)
    assert all(0 <= v < (1 << 31) - 1 for v in got.values())


def test_text_stats_signals(spark):
    from database_delta_plugins_spark.operators.text import text_stats

    df = spark.createDataFrame(
        [(1, "The cat and the dog, in a house!"),
         (2, "SHOUTING ALL CAPS"),
         (3, "xq zr kv plmn wrt"),   # no stopwords
         (4, "")],
        "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in text_stats(df).collect()}
    assert got[1]["stopword_ratio"] > 0.4          # the, and, the, in, a
    assert got[1]["punct_ratio"] > 0
    assert got[2]["upper_ratio"] == 1.0
    assert got[3]["stopword_ratio"] == 0.0
    assert got[4]["punct_ratio"] == 0.0 and got[4]["stopword_ratio"] == 0.0
