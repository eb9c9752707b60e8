import pytest
from py4j.protocol import Py4JJavaError
from pyspark.sql import functions as F

from database_delta_plugins_spark.operators.multimodal import (
    decode_media,
    frame_sample,
    synth_media_df,
)


def test_decode_plumbing(spark):
    media = synth_media_df(spark, n=50).repartition(4)
    out = decode_media(media, fake=True)
    rows = out.collect()
    assert len(rows) == 50
    r = next(r for r in rows if r["kind"] == "video")
    assert len(r["feature"]) == 8 and abs(sum(r["feature"]) - 1.0) < 1e-5
    assert r["n_frames"] >= 1
    # deterministic across partitionings
    again = decode_media(synth_media_df(spark, n=50).repartition(9), fake=True)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_real_decode_is_stubbed(spark):
    media = synth_media_df(spark, n=3)
    with pytest.raises(Exception) as ei:
        decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_frame_sample(spark):
    media = synth_media_df(spark, n=30)
    fs = frame_sample(media, every_n=5)
    assert fs.filter(F.col("frame_idx") % 5 != 0).count() == 0
    assert fs.select("media_id").distinct().count() == media.filter(F.col("meta.kind") == "video").count()


def test_resize_media_plumbing(spark):
    from pyspark.sql import functions as F

    from database_delta_plugins_spark.operators.multimodal import (
        resize_media,
        synth_media_df,
    )

    media = synth_media_df(spark, n=60)
    out = resize_media(media, target_w=128, target_h=128)
    assert out.count() == 60
    big = out.filter(F.col("meta.kind").isin("image", "video")).collect()
    assert all(r["meta"]["width"] <= 128 or r["meta"]["kind"] == "audio" for r in big)
    # audio rows pass through untouched
    audio_in = {r["media_id"]: bytes(r["payload"])
                for r in media.filter(F.col("meta.kind") == "audio").collect()}
    audio_out = {r["media_id"]: bytes(r["payload"])
                 for r in out.filter(F.col("meta.kind") == "audio").collect()}
    assert audio_in == audio_out
    # resized payloads shrink proportionally, never grow
    for r in out.collect():
        assert r["meta"]["n_bytes"] is None or len(bytes(r["payload"])) <= 400
