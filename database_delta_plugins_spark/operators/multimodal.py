"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is real and tested — schema, batch iteration,
partitioning, UDF signatures. The actual codec work is STUBBED
(`decode_media`) because no image/audio libraries ship in this
container: `fake=True` produces a deterministic fake decode (so the
distributed plumbing is testable end-to-end); `fake=False` raises
NotImplementedError where a real decoder (PIL/libav) would plug in.

At scale: media bytes never hit the driver; each Arrow batch is
processed executor-side; `repartition` before heavy decode balances
byte volume (media sizes are heavy-tailed), and metadata-only
operations (filtering by width/duration) prune before any decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("n_bytes", T.LongType(), True),
])


def media_schema(id_col: str = "media_id") -> T.StructType:
    return T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ])


DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("n_frames", T.IntegerType(), True),
])


def synth_media_df(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table (payload bytes derived from the id)
    for exercising the plumbing at any scale — pure column exprs."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.encode(F.concat(F.lit("MEDIA:"), F.repeat(F.conv(F.col("id") % 256, 10, 16), 64)), "utf-8")
            .cast("binary").alias("payload"),
            F.struct(
                F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                             (F.col("id") % 3 + 1).cast("int")).alias("kind"),
                F.lit("application/octet-stream").alias("mime"),
                (F.col("id") % 64 * 16 + 16).cast("int").alias("width"),
                (F.col("id") % 48 * 16 + 16).cast("int").alias("height"),
                (F.col("id") * 100).cast("long").alias("duration_ms"),
                F.lit(390).cast("long").alias("n_bytes"),
            ).alias("meta"),
        )
    )


def decode_media(df: DataFrame, fake: bool = True,
                 feature_dim: int = 8, batch_hint: int | None = None) -> DataFrame:
    """Decode / feature-extract via mapInPandas (Arrow batches).

    fake=True: deterministic feature vector from the payload bytes
    (plumbing test). fake=False: NotImplementedError — the real decoder
    (PIL / torchaudio / pyav) plugs in here."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this environment; use fake=True for plumbing tests"
                )
            feats, frames, kinds = [], [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                kind = meta["kind"] if meta is not None else None
                kinds.append(kind)
                if payload is None:
                    feats.append(None)
                    frames.append(None)
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                # deterministic 'feature': byte histogram folded to feature_dim
                hist = np.bincount(arr % feature_dim, minlength=feature_dim)
                feats.append((hist / max(len(arr), 1)).astype(np.float32).tolist())
                frames.append(int(meta["duration_ms"] // 1000) + 1 if kind == "video" else 1)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": kinds,
                "feature": feats,
                "n_frames": frames,
            })

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explodes a frame index per
    sampled frame (metadata math only — decode happens downstream)."""
    vids = df.filter(F.col("meta.kind") == "video")
    n_frames = (F.col("meta.duration_ms") / 1000).cast("int") + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return vids.select("media_id", F.explode(idx).alias("frame_idx"))


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", MEDIA_META, True),
])


def resize_media(df: DataFrame, target_w: int, target_h: int,
                 fake: bool = True) -> DataFrame:
    """Resize plumbing via mapInPandas: metadata-pruned (only image/video
    rows wider than the target are touched), Arrow-batched, output keeps
    the media schema with updated dims. fake=True produces a
    deterministic size-scaled payload (length scales with the pixel
    ratio) so the distributed path is testable end-to-end; fake=False is
    where a real resampler (PIL/libav) plugs in — not available in this
    container."""
    needs = df.filter(
        (F.col("meta.kind").isin("image", "video"))
        & ((F.col("meta.width") > target_w) | (F.col("meta.height") > target_h))
    )
    passthrough = df.exceptAll(needs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media resize requires image libs not present in "
                    "this environment; use fake=True for plumbing tests")
            payloads, metas = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                if payload is None or meta is None:
                    payloads.append(payload)
                    metas.append(meta)
                    continue
                w, h = meta["width"], meta["height"]
                ratio = (target_w * target_h) / max(w * h, 1)
                new_len = max(int(len(payload) * min(ratio, 1.0)), 1)
                m = dict(meta.asDict() if hasattr(meta, "asDict") else meta)
                m["width"], m["height"] = min(w, target_w), min(h, target_h)
                m["n_bytes"] = new_len
                payloads.append(bytes(payload[:new_len]))
                metas.append(m)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "payload": payloads, "meta": metas})

    resized = needs.mapInPandas(run, schema=RESIZED_SCHEMA)
    return passthrough.select("media_id", "payload", "meta").unionByName(resized)
