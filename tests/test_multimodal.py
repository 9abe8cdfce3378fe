"""Multimodal plumbing: binary payload decode → feature extraction via
mapInPandas (deterministic fake decoder; real libs absent here)."""

import numpy as np
import pytest

from informers_spark.operators.multimodal import (
    extract_image_features,
    fake_decode,
    make_synthetic_media,
    sample_video_frames,
)


def test_feature_extraction_shapes_and_determinism(spark):
    media = make_synthetic_media(spark, n=16)
    out = extract_image_features(media).orderBy("media_id").collect()
    assert len(out) == 16
    assert all(len(r.features) == 6 for r in out)  # 3-ch mean + 3-ch std
    again = extract_image_features(make_synthetic_media(spark, n=16)).orderBy("media_id").collect()
    assert out[0].features == again[0].features


def test_fake_decode_rejects_foreign_bytes():
    with pytest.raises(NotImplementedError):
        fake_decode(b"\x89PNG\r\n\x1a\nnotreal")


def test_decode_roundtrip_shape():
    import struct

    w, h, c = 4, 3, 3
    payload = b"ISMM" + struct.pack("<HHH", w, h, c) + bytes(range(w * h * c))
    img = fake_decode(payload)
    assert img.shape == (h, w, c)


def test_video_frame_sampling(spark):
    from pyspark.sql import functions as F

    media = make_synthetic_media(spark, n=2).withColumn(
        "meta",
        F.struct(
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.channels").alias("channels"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.lit(25).alias("n_frames"),
        ),
    )
    rows = sample_video_frames(media, every_n=10).collect()
    per_media = {}
    for r in rows:
        per_media.setdefault(r.media_id, []).append(r.frame_idx)
    assert sorted(per_media[0]) == [0, 10, 20]
