"""D1-D12 decode/normalize semantics (reference:
mysql/MySqlRecordConsumer.java:78-225, sqlserver/SqlServerRecordConsumer.java)."""
from pyspark.sql import functions as F

from database_delta_plugins_spark.operators import decode
from database_delta_plugins_spark.sources.generator import cdc_events_df, rich_events_df


def test_opcode_map_and_unknown_dropped(spark):
    df = spark.createDataFrame(
        [("c",), ("r",), ("u",), ("d",), ("x",)], ["op"]
    )
    got = {r["op"]: r["op_type"] for r in decode.map_opcode(df).collect()}
    # c/r -> I, u -> U, d -> D (MySqlRecordConsumer.java:170-183); x dropped
    assert got == {"c": "I", "r": "I", "u": "U", "d": "D"}


def test_row_image_select(spark, sf_dir):
    ev = rich_events_df(spark, sf_dir, revs=3, with_html=False)
    d = decode.select_row_image(ev)
    # DELETE rows carry the before image (SqlServerRecordConsumer.java:216-218)
    dels = d.filter(F.col("op") == "d")
    assert dels.filter(F.col("row").isNull()).count() == 0
    assert dels.filter(~F.col("row.url").eqNullSafe(F.col("before.url"))).count() == 0
    ins = d.filter(F.col("op").isin("c", "r"))
    assert ins.filter(~F.col("row.url").eqNullSafe(F.col("after.url"))).count() == 0


def test_blacklist_and_replay_filter(spark, sf_dir):
    ev = decode.map_opcode(cdc_events_df(spark, sf_dir))
    no_del = decode.filter_dml_blacklist(ev, {"D"})
    assert no_del.filter(F.col("op_type") == "D").count() == 0
    assert decode.filter_dml_blacklist(ev, None).count() == ev.count()
    frontier = 500
    kept = decode.filter_replayed(ev, frontier)
    assert kept.filter(F.col("lsn") <= frontier).count() == 0
    assert decode.filter_replayed(ev, None).count() == ev.count()


def test_txn_id_synthesis(spark, sf_dir):
    # gtid wins; else file:pos (MySqlRecordConsumer.java:190-195)
    ev = decode.synth_txn_id(cdc_events_df(spark, sf_dir).drop("txn_id"))
    with_gtid = ev.filter(F.col("gtid").isNotNull())
    assert with_gtid.filter(F.col("txn_id") != F.col("gtid")).count() == 0
    without = ev.filter(F.col("gtid").isNull())
    assert without.filter(
        F.col("txn_id") != F.concat_ws(":", "binlog_file", F.col("binlog_pos").cast("string"))
    ).count() == 0


def test_full_decode_stack(spark, sf_dir):
    ev = rich_events_df(spark, sf_dir, revs=3, with_html=False)
    d = decode.decode_events(ev)
    assert set(["url", "warc_ts", "text", "lang", "op_type", "lsn", "seq"]).issubset(d.columns)
    assert d.filter(F.col("op_type").isNull()).count() == 0
    # projection: restrict payload columns
    d2 = decode.decode_events(ev, columns=["url", "text"])
    assert "lang" not in [c for c in d2.columns if c not in
                          ("op_type", "lsn", "seq", "ts_ms", "is_snapshot", "txn_id")]
