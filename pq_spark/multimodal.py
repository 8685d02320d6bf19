"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A training-data pipeline at 100 TB carries media as ``binary`` columns with
a typed metadata struct alongside. This module makes the Spark-side
plumbing real — schemas, Arrow batch shapes, partition-friendly UDF
signatures — while the actual codecs are stubbed (this container has no
image/audio libraries): ``decode`` parses our deterministic synthetic
container format; a real deployment swaps the few marked lines for
PIL/ffmpeg calls without touching any Spark code.

Synthetic container format (deterministic fake, little-endian):
    magic   u16 = 0x4D4D ('MM')
    kind    u8  (0=image, 1=audio, 2=video)
    width   u16 | sample_rate u16 | width u16
    height  u16 | n_samples   u16 | height u16
    frames  u16 (1 for image/audio)
    payload u8[] (pseudo-pixels/samples; length = w*h or n_samples)
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MAGIC = 0x4D4D

MEDIA_SCHEMA = (
    "media_id long, kind string, blob binary, "
    "meta struct<width:int, height:int, frames:int, sample_rate:int, n_bytes:int>"
)

FEATURES_SCHEMA = (
    "media_id long, kind string, width int, height int, frames int, "
    "mean_intensity double, n_payload int"
)

THUMB_SCHEMA = "media_id long, thumb binary, thumb_w int, thumb_h int"
FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (distributed generation)."""
    df = spark.range(0, n)
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    kind_i = (h % 3).cast("int")
    w = (h % 13 + 4).cast("int")
    ht = (h % 11 + 4).cast("int")
    frames = F.when(kind_i == 2, (h % 5 + 2).cast("int")).otherwise(F.lit(1))

    @F.pandas_udf("binary")
    def make_blob(mid: pd.Series, kind: pd.Series, w: pd.Series, ht: pd.Series,
                  fr: pd.Series) -> pd.Series:
        out = []
        for m, k, wi, hi, f in zip(mid, kind, w, ht, fr):
            payload_len = int(wi) * int(hi) * int(f)
            rng = np.random.default_rng(int(m) + 1)
            payload = rng.integers(0, 256, payload_len, dtype=np.uint8).tobytes()
            out.append(
                struct.pack("<HBHHH", MAGIC, int(k), int(wi), int(hi), int(f)) + payload
            )
        return pd.Series(out)

    blob = make_blob(F.col("id"), kind_i, w, ht, frames)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")), kind_i + 1
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        blob.alias("blob"),
        F.struct(
            w.alias("width"), ht.alias("height"), frames.alias("frames"),
            F.lit(16000).alias("sample_rate"), F.length(blob).alias("n_bytes"),
        ).alias("meta"),
    )


def _parse_header(b: bytes):
    magic, kind, w, h, frames = struct.unpack_from("<HBHHH", b, 0)
    if magic != MAGIC:
        raise ValueError("bad media container magic")
    return kind, w, h, frames, b[9:]


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    REAL-CODEC SEAM: replace ``_parse_header``/numpy with PIL/librosa here;
    everything else (schema, batching, partitioning) is production-shaped.
    """

    def fe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = {k: [] for k in
                    ("media_id", "kind", "width", "height", "frames",
                     "mean_intensity", "n_payload")}
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                kind, w, h, frames, payload = _parse_header(bytes(blob))
                arr = np.frombuffer(payload, dtype=np.uint8)
                rows["media_id"].append(mid)
                rows["kind"].append(kinds[kind])
                rows["width"].append(w)
                rows["height"].append(h)
                rows["frames"].append(frames)
                rows["mean_intensity"].append(float(arr.mean()) if len(arr) else 0.0)
                rows["n_payload"].append(len(arr))
            yield pd.DataFrame(rows)

    return media.select("media_id", "blob").mapInPandas(fe, FEATURES_SCHEMA)


def resize_images(media: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """'Resize' images: nearest-neighbor downsample of the pseudo-pixels.
    Real deployment: PIL.Image.resize at the marked seam."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, thumbs = [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                kind, w, h, frames, payload = _parse_header(bytes(blob))
                if kind != 0:
                    continue
                img = np.frombuffer(payload[: w * h], dtype=np.uint8).reshape(h, w)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                thumb = img[np.ix_(yi, xi)]  # REAL-CODEC SEAM (PIL resize)
                ids.append(mid)
                thumbs.append(thumb.tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "thumb": thumbs,
                 "thumb_w": [out_w] * len(ids), "thumb_h": [out_h] * len(ids)}
            )

    return media.filter(F.col("kind") == "image").select("media_id", "blob").mapInPandas(
        rs, THUMB_SCHEMA
    )


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sample videos: emit every Nth frame as its own binary row
    (the fan-out shape of a real frame extractor)."""

    def sf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames_out = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                kind, w, h, n_frames, payload = _parse_header(bytes(blob))
                if kind != 2:
                    continue
                frame_sz = w * h
                for i in range(0, n_frames, every):
                    ids.append(mid)
                    idxs.append(i)
                    frames_out.append(payload[i * frame_sz : (i + 1) * frame_sz])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames_out})

    return media.filter(F.col("kind") == "video").select("media_id", "blob").mapInPandas(
        sf, FRAME_SCHEMA
    )
