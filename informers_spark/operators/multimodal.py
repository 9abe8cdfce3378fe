"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched mapInPandas UDFs.

The reference's vision/audio path (libvips RawImage, ffmpeg PCM decode —
reference: lib/informers/utils/image.rb, lib/informers/utils/ffmpeg.rb)
is single-file FFI; the Spark-side design is: binary payload + metadata
struct travel as columns, decode/feature steps run per Arrow batch on
executors. The decode libs (vips/ffmpeg/PIL) are NOT in this container,
so `decode_fn` defaults to a deterministic fake that parses our synthetic
header — the Spark plumbing (schema, batching, UDF signature, partition
behavior) is real and tested; swap `decode_fn` for a real decoder in a
container that has one.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from informers_spark.rebalance import spread_scan

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

_MAGIC = b"ISMM"  # synthetic header: magic + w + h + c (uint16 each)


def make_synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = header + seeded bytes)."""
    rows = []
    for i in range(n):
        w, h, c = 8 + (i * 7 + seed) % 24, 8 + (i * 11 + seed) % 24, 3
        rng = np.random.Generator(np.random.PCG64(seed * 100_003 + i))
        body = rng.integers(0, 256, size=w * h * c, dtype=np.uint8).tobytes()
        payload = _MAGIC + struct.pack("<HHH", w, h, c) + body
        rows.append((i, "image", bytearray(payload), (w, h, c, None, None)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    kind: str = "image",
    max_side: int = 24,
    audio_samples: int = 4096,
) -> DataFrame:
    """Distributed synthetic media: one payload per input row, seeded by
    the row id — generated INSIDE the executors (mapInPandas), so the
    media table scales with the input scan instead of being driver-built
    like make_synthetic_media. Deterministic per id regardless of
    partitioning. kind='image' → ISMM-headered HWC bytes;
    kind='audio' → f32le PCM (the ffmpeg decode shape,
    reference utils/ffmpeg.rb:28-42)."""
    schema = T.StructType(
        [df.schema[id_col]]
        + [
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid in pdf[id_col]:
                i = int(rid)
                rng = np.random.Generator(np.random.PCG64(1_000_003 * i + 7))
                if kind == "image":
                    w = 8 + (i * 7) % (max_side - 7)
                    h = 8 + (i * 11) % (max_side - 7)
                    body = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8)
                    payload = _MAGIC + struct.pack("<HHH", w, h, 3) + body.tobytes()
                    rows.append((rid, bytearray(payload), w, h, None))
                else:
                    t = np.arange(audio_samples, dtype=np.float64) / 16000.0
                    f0 = 100.0 + (i % 40) * 25.0
                    wave = (
                        np.sin(2 * np.pi * f0 * t)
                        + 0.3 * np.sin(2 * np.pi * 2 * f0 * t)
                        + 0.1 * rng.standard_normal(audio_samples)
                    ).astype(np.float32)
                    rows.append((rid, bytearray(wave.tobytes()), None, None, 16000))
            yield pd.DataFrame(
                rows, columns=[id_col, "payload", "width", "height", "sample_rate"]
            )

    return spread_scan(df.select(id_col)).mapInPandas(gen, schema=schema)


def validate_media(
    df: DataFrame,
    payload_col: str = "payload",
    decode_fn=None,
    keep_bad: bool = False,
) -> DataFrame:
    """Decode-probe filter: try-decode each payload and keep rows whose
    payload decodes (or, with keep_bad=True, append a `decode_ok` flag
    instead of filtering). Run this BEFORE a vision pipeline on untrusted
    corpora — a single corrupt payload inside an Arrow batch would
    otherwise fail the task (and, after Spark's retry budget, the job).
    The probe decodes in the same executor pass that would re-decode in
    the pipeline; at scale the second decode is cheap relative to the
    model forward, and the filtered scan lets the pipeline assume clean
    inputs."""
    if decode_fn is None:
        decode_fn = auto_decode
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("decode_ok", T.BooleanType())]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok = []
            for payload in pdf[payload_col]:
                try:
                    decode_fn(bytes(payload))
                    ok.append(True)
                except Exception:
                    ok.append(False)
            out = pdf.copy()
            out["decode_ok"] = ok
            yield out

    probed = spread_scan(df).mapInPandas(probe, schema=schema)
    if keep_bad:
        return probed
    return probed.filter(F.col("decode_ok")).drop("decode_ok")


def fake_decode(payload: bytes) -> np.ndarray:
    """Parse the synthetic header → HWC uint8 array. Raises on foreign
    bytes (auto_decode routes those to a real decoder when one exists)."""
    if payload[:4] != _MAGIC:
        raise NotImplementedError(
            "not a synthetic ISMM payload — use auto_decode, which "
            "import-guards a real decoder (PIL) for standard formats"
        )
    w, h, c = struct.unpack("<HHH", payload[4:10])
    return np.frombuffer(payload[10:10 + w * h * c], dtype=np.uint8).reshape(h, w, c)


def auto_decode(payload: bytes) -> np.ndarray:
    """Default decoder: synthetic ISMM header → fake_decode; anything else
    → Pillow, import-guarded (this container lacks vips/PIL/ffmpeg —
    reference decodes via libvips, lib/informers/utils/image.rb:14-29).
    On a real cluster `pip install pillow` activates the real path with
    no code change; without it, foreign bytes raise with the guard
    message instead of silently producing garbage."""
    if payload[:4] == _MAGIC:
        return fake_decode(payload)
    try:
        import io

        from PIL import Image  # import-guarded: wheel absent in sandbox
    except ImportError as e:
        raise NotImplementedError(
            "real image decoding requires the pillow wheel (or swap "
            "decode_fn for a vips/ffmpeg-backed decoder); not available "
            "in this container"
        ) from e
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    decode_fn=auto_decode,
    resize_to: int = 8,
) -> DataFrame:
    """Decode → bilinear resize (reference-parity interpolate kernel,
    math.rb:3-71) → per-channel mean/std feature vector. One mapInPandas;
    all input columns pass through."""
    schema = T.StructType(
        [f for f in df.schema.fields if f.name != payload_col]
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )
    keep = [f.name for f in df.schema.fields if f.name != payload_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from informers_spark.functions.kernels import interpolate

        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                img = decode_fn(bytes(payload)).astype(np.float32)
                # HWC → CHW, bilinear resize (processors.rb:219-330 chain
                # resizes before normalize), then per-channel stats
                small = interpolate(img.transpose(2, 0, 1), resize_to, resize_to)
                feat = np.concatenate(
                    [small.mean(axis=(1, 2)), small.std(axis=(1, 2))]
                ).astype(np.float32)
                feats.append(feat)
            out = pdf[keep].copy()
            out["features"] = feats
            yield out

    return spread_scan(df).mapInPandas(run, schema=schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_n: int = 10,
) -> DataFrame:
    """Frame-sampling plumbing: explode a video payload into frame rows
    (frame decode stubbed — container has no ffmpeg). Emits one row per
    sampled frame index based on meta.n_frames."""
    frames = df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )
    return frames
