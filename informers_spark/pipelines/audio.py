"""Audio pipelines as DataFrame transforms over binary PCM columns.

Reference (lib/informers/pipelines.rb): AudioClassification (:895-928),
ZeroShotAudioClassification (:930-971), TextToAudio (:801-819). The
reference decodes files to mono f32 PCM via an ffmpeg pipe
(utils/ffmpeg.rb:18-43); here the payload column IS the f32le PCM buffer
(meta.sample_rate carries the rate) — on a real cluster the decode UDF
in operators/multimodal.py swaps in an ffmpeg-backed decode_fn.

Feature extraction parity: Wav2Vec2FeatureExtractor's zero-mean
unit-variance normalize (processors.rb:749-772) runs per clip before the
forward, exactly when do_normalize is set.

Spark shape: one mapInPandas per pipeline, batched forwards, slim typed
outputs; no exchange before the UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from informers_spark.functions.kernels import get_top_items, softmax
from informers_spark.rebalance import spread_scan
from informers_spark.functions.vision import zero_mean_unit_var
from informers_spark.pipelines.vision import _base_tuples


def _pcm(payload: bytes) -> np.ndarray:
    """f32le buffer -> 1-D waveform (the shape ffmpeg's `-f f32le`
    unpack("e*") produces, utils/ffmpeg.rb:28-42). An empty/corrupt
    payload decodes to one zero sample (silence) so downstream
    mean/std feature math never sees an empty slice (NaN scores)."""
    wave = np.frombuffer(bytes(payload), dtype=np.float32)
    return wave if len(wave) else np.zeros(1, dtype=np.float32)


def audio_classify(
    df: DataFrame,
    payload_col: str = "payload",
    top_k: int | None = None,
    do_normalize: bool = True,
    labels: list[str] | None = None,
    backend: str = "auto",
    backend_opts: dict | None = None,
) -> DataFrame:
    """Per-clip forward -> softmax -> top-k (label, score, rank) rows
    (reference pipelines.rb:895-928; top_k=nil means all labels, the
    get_top_items(nil) behavior)."""
    opts = backend_opts or {}
    keep = [f for f in df.schema.fields if f.name != payload_col]
    schema = T.StructType(
        keep
        + [
            T.StructField("label", T.StringType()),
            T.StructField("score", T.FloatType()),
            T.StructField("rank", T.IntegerType()),
        ]
    )
    keep_names = [f.name for f in keep]

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from informers_spark.backend.base import get_backend

        be = get_backend(backend, **opts)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            waves = [_pcm(p) for p in pdf[payload_col]]
            if do_normalize:
                waves = [zero_mean_unit_var(w) for w in waves]
            logits, id2label = be.audio_forward(waves, labels)
            probs = softmax(logits, axis=-1)
            rows = []
            bases = _base_tuples(pdf, keep_names)
            for i in range(len(pdf)):
                base = bases[i]
                items = get_top_items(probs[i], top_k or 0)
                rows.extend(
                    base + (id2label[idx], float(s), r + 1)
                    for r, (idx, s) in enumerate(items)
                )
            yield pd.DataFrame(rows, columns=keep_names + ["label", "score", "rank"])

    return spread_scan(df).mapInPandas(infer, schema=schema)


def zero_shot_audio_classify(
    df: DataFrame,
    candidate_labels: list[str],
    payload_col: str = "payload",
    hypothesis_template: str = "This is a sound of {}.",
    backend: str = "auto",
    backend_opts: dict | None = None,
) -> DataFrame:
    """CLAP-style: template-filled labels x audio -> logits_per_audio ->
    softmax -> one row per (clip, label) in candidate order (reference
    pipelines.rb:930-971 keeps label order, no sort)."""
    opts = backend_opts or {}
    keep = [f for f in df.schema.fields if f.name != payload_col]
    schema = T.StructType(
        keep
        + [T.StructField("label", T.StringType()), T.StructField("score", T.FloatType())]
    )
    keep_names = [f.name for f in keep]
    # Ruby String#sub replaces only the FIRST "{}" (pipelines.rb:951)
    texts = [hypothesis_template.replace("{}", x, 1) for x in candidate_labels]

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from informers_spark.backend.base import get_backend

        be = get_backend(backend, **opts)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            waves = [_pcm(p) for p in pdf[payload_col]]
            probs = softmax(be.clap_scores(waves, texts), axis=-1)
            rows = []
            bases = _base_tuples(pdf, keep_names)
            for i in range(len(pdf)):
                base = bases[i]
                rows.extend(
                    base + (candidate_labels[j], float(probs[i, j]))
                    for j in range(len(candidate_labels))
                )
            yield pd.DataFrame(rows, columns=keep_names + ["label", "score"])

    return spread_scan(df).mapInPandas(infer, schema=schema)


def text_to_audio(
    df: DataFrame,
    text_col: str = "text",
    sampling_rate: int = 16000,
    backend: str = "auto",
    backend_opts: dict | None = None,
) -> DataFrame:
    """Text -> waveform (TextToAudio waveform branch, reference
    pipelines.rb:801-819 returns {audio, sampling_rate}). Output: f32le
    PCM payload + sampling_rate + n_samples."""
    opts = backend_opts or {}
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("audio", T.BinaryType()),
            T.StructField("sampling_rate", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
        ]
    )

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from informers_spark.backend.base import get_backend

        be = get_backend(backend, **opts)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            texts = pdf[text_col].fillna("").astype(str).tolist()
            waves, sr = be.text_to_waveform(texts, sampling_rate)
            out = pdf.copy()
            out["audio"] = [bytearray(w.tobytes()) for w in waves]
            out["sampling_rate"] = np.int32(sr)
            out["n_samples"] = [len(w) for w in waves]
            yield out

    return spread_scan(df).mapInPandas(infer, schema=schema)
