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


def test_png_roundtrip_all_filters_golden():
    """r4: the stdlib PNG codec — every scanline filter type, every
    supported color type, byte-exact pixel round-trip; plus golden-byte
    checks of the container format itself."""
    import struct
    import zlib

    import numpy as np

    from database_delta_plugins_spark.operators.multimodal import (
        png_decode,
        png_encode,
    )

    rng = np.random.RandomState(7)
    shapes = [(5, 9), (8, 8, 3), (4, 6, 4), (1, 1), (3, 2, 3)]
    for shape in shapes:
        arr = rng.randint(0, 256, size=shape).astype(np.uint8)
        for f in range(5):
            data = png_encode(arr, filter_type=f)
            # container golden checks
            assert data[:8] == b"\x89PNG\r\n\x1a\n"
            assert data[12:16] == b"IHDR"
            w, h = struct.unpack(">II", data[16:24])
            assert (h, w) == shape[:2]
            back = png_decode(data)
            assert back.shape == arr.shape and back.dtype == np.uint8
            assert np.array_equal(back, arr), f"shape={shape} filter={f}"
    # corrupt CRC must raise, not silently decode
    arr = rng.randint(0, 256, size=(4, 4)).astype(np.uint8)
    data = bytearray(png_encode(arr))
    data[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    try:
        png_decode(bytes(data))
        raise AssertionError("corrupt CRC accepted")
    except ValueError:
        pass
    # zlib stream sanity: IDAT holds h*(stride+1) filtered bytes
    data = png_encode(np.zeros((3, 5), np.uint8))
    pos, idat = 8, b""
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    assert len(zlib.decompress(idat)) == 3 * (5 + 1)


def test_decode_media_real_png(spark):
    """r4: decode_media(fake=False) really decodes — the feature
    histogram of each row equals the one computed from the generative
    pixel formula, for ids covering all five filter types and both
    color modes."""
    import numpy as np

    from database_delta_plugins_spark.operators.multimodal import (
        decode_media,
        synth_png_media_df,
    )

    ids = spark.range(20).withColumnRenamed("id", "doc_id")
    media = synth_png_media_df(ids)
    got = {r["media_id"]: r for r in decode_media(media, fake=False,
                                                  feature_dim=8).collect()}
    assert len(got) == 20
    for mid in range(20):
        w, h = 8 * (mid % 5 + 1), 8 * (mid % 4 + 1)
        ch = 1 if mid % 2 == 0 else 3
        y, x, c = np.ogrid[0:h, 0:w, 0:ch]
        px = ((x * x + 3 * y * y + 11 * c + mid) % 256).astype(np.uint8).ravel()
        want = np.bincount(px % 8, minlength=8) / px.size
        assert got[mid]["kind"] == "image"
        assert got[mid]["n_frames"] == 1
        assert np.allclose(got[mid]["feature"], want, atol=1e-6), mid


def test_wav_roundtrip_golden():
    """r5: the stdlib WAV codec — decode(encode(x)) == x for mono/
    stereo/multichannel int16 PCM at several rates, plus malformed-
    input rejection (non-PCM sampwidth)."""
    import io
    import wave

    import numpy as np

    from database_delta_plugins_spark.operators.multimodal import (
        wav_decode,
        wav_encode,
    )

    rng = np.random.RandomState(5)
    for n, ch, rate in [(1, 1, 8000), (256, 2, 44100), (999, 4, 16000)]:
        s = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
        out, r = wav_decode(wav_encode(s, rate))
        assert np.array_equal(out, s) and r == rate
    # 1-D mono input round-trips as (n, 1)
    s = rng.randint(-32768, 32768, 64).astype(np.int16)
    out, _ = wav_decode(wav_encode(s))
    assert out.shape == (64, 1) and np.array_equal(out[:, 0], s)
    # extremes survive the int16 wire format
    s = np.array([[-32768], [32767], [0]], dtype=np.int16)
    assert np.array_equal(wav_decode(wav_encode(s))[0], s)
    # 8-bit PCM is rejected, not silently misread
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"\x00\x01\x02")
    try:
        wav_decode(buf.getvalue())
        raise AssertionError("8-bit WAV should be rejected")
    except ValueError:
        pass


def test_decode_media_real_wav(spark):
    """r5: decode_media(fake=False) really parses WAV — the feature
    histogram of each row equals the one computed from the generative
    sample formula, covering mono/stereo and all four lengths."""
    import numpy as np

    from database_delta_plugins_spark.operators.multimodal import (
        decode_media,
        synth_wav_media_df,
    )

    ids = spark.range(16).withColumnRenamed("id", "doc_id")
    media = synth_wav_media_df(ids)
    got = {r["media_id"]: r for r in decode_media(media, fake=False,
                                                  feature_dim=8).collect()}
    assert len(got) == 16
    for mid in range(16):
        n = 256 * (mid % 4 + 1)
        ch = 1 if mid % 2 == 0 else 2
        i, c = np.ogrid[0:n, 0:ch]
        x = (7 * i * i + 13 * i + 31 * c + 17 * mid).ravel() % 8
        want = np.bincount(x, minlength=8) / x.size
        assert got[mid]["kind"] == "audio"
        assert got[mid]["n_frames"] == n
        assert np.allclose(got[mid]["feature"], want, atol=1e-6), mid


def test_avi_roundtrip_golden():
    """r5: avi_encode -> avi_decode is the identity on uint8 RGB frame
    stacks, including non-DWORD-aligned widths (the DIB row-stride
    padding path) and single-pixel edge cases; fps survives the header
    round-trip; compressed / non-24bpp streams are rejected, not
    silently misread."""
    import struct

    import numpy as np

    from database_delta_plugins_spark.operators.multimodal import (
        avi_decode,
        avi_encode,
    )

    rng = np.random.RandomState(11)
    for t, h, w in [(1, 1, 1), (2, 8, 8), (3, 5, 7), (2, 3, 10), (4, 16, 24)]:
        fr = rng.randint(0, 256, size=(t, h, w, 3), dtype=np.uint8)
        dec, fps = avi_decode(avi_encode(fr, fps=10))
        assert dec.shape == fr.shape and np.array_equal(dec, fr), (t, h, w)
        assert fps == 10
    _, fps = avi_decode(avi_encode(rng.randint(0, 256, (1, 2, 2, 3),
                                               dtype=np.uint8), fps=30))
    assert fps == 30
    # tampered biCompression is rejected
    enc = bytearray(avi_encode(rng.randint(0, 256, (1, 4, 4, 3),
                                           dtype=np.uint8)))
    i = enc.index(b"strf") + 8
    struct.pack_into("<I", enc, i + 16, 1)  # biCompression = BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        avi_decode(bytes(enc))
    # truncated / foreign byte streams are rejected
    with pytest.raises(ValueError, match="RIFF/AVI"):
        avi_decode(b"RIFF\x04\x00\x00\x00WAVE")


def test_decode_media_real_avi(spark):
    """r5: decode_media(fake=False) really parses AVI — the feature
    histogram of each row equals the one computed from the generative
    pixel formula, and n_frames comes from the decoded container, not
    metadata."""
    import numpy as np

    from database_delta_plugins_spark.operators.multimodal import (
        decode_media,
        synth_avi_media_df,
    )

    ids = spark.range(12).withColumnRenamed("id", "doc_id")
    media = synth_avi_media_df(ids)
    got = {r["media_id"]: r for r in decode_media(media, fake=False,
                                                  feature_dim=8).collect()}
    assert len(got) == 12
    for mid in range(12):
        nf, w, h = mid % 3 + 2, 8 * (mid % 3 + 1), 8 * (mid % 2 + 1)
        t, y, x, c = np.ogrid[0:nf, 0:h, 0:w, 0:3]
        v = ((x * x + 3 * y * y + 5 * t * t + 7 * c + mid) % 256).ravel() % 8
        want = np.bincount(v, minlength=8) / v.size
        assert got[mid]["kind"] == "video"
        assert got[mid]["n_frames"] == nf
        assert np.allclose(got[mid]["feature"], want, atol=1e-6), mid


def test_decode_frames_per_frame_features(spark):
    """r5: decode_frames emits one row per SAMPLED frame with that
    frame's own histogram — frame attribution, not just whole-video
    decode; non-video rows are pruned before the codec."""
    import numpy as np

    from database_delta_plugins_spark.operators.multimodal import (
        decode_frames,
        synth_avi_media_df,
        synth_wav_media_df,
    )

    ids = spark.range(9).withColumnRenamed("id", "doc_id")
    media = synth_avi_media_df(ids)
    got = {(r["media_id"], r["frame_idx"]): r["feature"]
           for r in decode_frames(media, every_n=2, feature_dim=8).collect()}
    # every 2nd frame of nf = id%3+2 frames
    want_keys = {(mid, fi) for mid in range(9)
                 for fi in range(0, mid % 3 + 2, 2)}
    assert set(got) == want_keys
    for (mid, fi), feat in got.items():
        w, h = 8 * (mid % 3 + 1), 8 * (mid % 2 + 1)
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        v = ((x * x + 3 * y * y + 5 * fi * fi + 7 * c + mid) % 256) \
            .ravel() % 8
        want = np.bincount(v, minlength=8) / v.size
        assert np.allclose(feat, want, atol=1e-6), (mid, fi)
    # audio rows never reach the codec (pruned on meta.kind)
    assert decode_frames(synth_wav_media_df(ids), every_n=1).count() == 0
    # non-AVI video mime is the documented codec seam, not a parse crash
    from database_delta_plugins_spark.operators.multimodal import synth_media_df
    with pytest.raises(Exception) as ei:
        decode_frames(synth_media_df(spark, n=6), every_n=1).collect()
    assert "NotImplementedError" in str(ei.value) \
        or isinstance(ei.value, NotImplementedError)
