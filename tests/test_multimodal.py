"""Multimodal plumbing: deterministic fake codecs over real Spark shapes."""

import numpy as np
from pyspark.sql import functions as F

from pq_spark.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synth_media,
)


def test_media_features(spark):
    media = synth_media(spark, 200).cache()
    feats = extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 200
    meta = {r["media_id"]: r for r in media.select("media_id", "kind", "meta").collect()}
    for mid, r in rows.items():
        m = meta[mid]
        assert r["kind"] == m["kind"]
        assert r["width"] == m["meta"]["width"]
        assert r["n_payload"] == m["meta"]["width"] * m["meta"]["height"] * m["meta"]["frames"]
        assert 0.0 <= r["mean_intensity"] <= 255.0


def test_media_deterministic(spark):
    a = extract_features(synth_media(spark, 50)).orderBy("media_id").collect()
    b = extract_features(synth_media(spark, 50)).orderBy("media_id").collect()
    assert a == b


def test_resize_and_frames(spark):
    media = synth_media(spark, 200).cache()
    thumbs = resize_images(media, 4, 4).collect()
    assert thumbs and all(len(bytes(t["thumb"])) == 16 for t in thumbs)
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(thumbs) == n_images

    frames = sample_frames(media, every=2)
    got = frames.groupBy("media_id").count().collect()
    vids = {
        r["media_id"]: r["meta"]["frames"]
        for r in media.filter(F.col("kind") == "video").select("media_id", "meta").collect()
    }
    assert {r["media_id"] for r in got} == set(vids)
    for r in got:
        expected = (vids[r["media_id"]] + 1) // 2
        assert r["count"] == expected
