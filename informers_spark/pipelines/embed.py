"""Embedding / feature-extraction pipeline as a DataFrame transform.

Reference dataflow (lib/informers/pipelines.rb:821-882, embedding defaults
pooling:"mean", normalize:true at :1042-1051):
    tokenize → forward → mean_pool (utils/tensor.rb:3-17) → L2 normalize
    (utils/tensor.rb:19-24)

Spark design: one mapInPandas over Arrow batches — the Arrow batch IS the
inference batch (amortizes the model call exactly like the reference's
padded-batch forward). Everything else stays JVM-side. At 100 TB the scan
partitions bound memory via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from informers_spark.functions.kernels import mean_pooling, normalize


def embed(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    pooling: str = "mean",
    do_normalize: bool = True,
    quantize: str | None = None,
    backend: str = "auto",
    backend_opts: dict | None = None,
) -> DataFrame:
    """Append an array<float> embedding column. All input columns pass through.

    quantize: None | "binary" (sign → {1,-1} int8 per dim) | "ubinary"
    (sign bits packed 8-per-byte). The reference calls
    quantize_embeddings(result, precision) (pipelines.rb:876-877) but
    never defines it — semantics follow the transformers.js original it
    ports.
    """
    opts = backend_opts or {}
    elem = T.FloatType() if quantize is None else T.IntegerType()
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(elem))]
    )

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from informers_spark.backend.base import get_backend

        be = get_backend(backend, **opts)
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = pd.Series([], dtype=object)
                yield pdf
                continue
            texts = pdf[text_col].fillna("").astype(str).tolist()
            if pooling == "mean" and hasattr(be, "mean_encode"):
                # fused tokenize+pool fast path (no padded hidden tensor)
                pooled = be.mean_encode(texts)
            elif pooling == "mean":
                hidden, mask = be.encode(texts)
                pooled = mean_pooling(hidden, mask)
            elif pooling == "cls":
                hidden, mask = be.encode(texts)
                pooled = hidden[:, 0, :]  # first token (pipelines.rb:866)
            else:
                raise ValueError(f"unsupported pooling: {pooling}")
            if do_normalize:
                pooled = normalize(pooled)
            if quantize == "binary":
                pooled = np.where(pooled > 0, 1, -1).astype(np.int32)
            elif quantize == "ubinary":
                pooled = np.packbits(pooled > 0, axis=-1).astype(np.int32)
            pdf = pdf.copy()
            pdf[out_col] = list(pooled)
            yield pdf

    return df.mapInPandas(infer, schema=schema)
