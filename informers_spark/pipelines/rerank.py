"""Reranking pipeline as a DataFrame transform.

Reference (lib/informers/pipelines.rb:1053-1081): tokenize query paired
with each doc → forward → sigmoid(logits[:,0]) → sort desc → top_k.

Spark design: pair-scoring UDF over (query, doc) rows, then top-k via a
window partitioned by the query keys — distributed, no driver sort.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from informers_spark.functions.kernels import sigmoid
from informers_spark.rebalance import spread_scan


def rerank(
    df: DataFrame,
    query_col: str = "query",
    doc_col: str = "text",
    group_cols: list[str] | None = None,
    top_k: int | None = None,
    backend: str = "auto",
    backend_opts: dict | None = None,
) -> DataFrame:
    """Score (query, doc) rows; append score (+ rank, filtered to top_k)."""
    opts = backend_opts or {}
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField("score", T.FloatType())]
    )

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from informers_spark.backend.base import get_backend

        be = get_backend(backend, **opts)
        for pdf in batches:
            if len(pdf) == 0:
                pdf["score"] = pd.Series([], dtype="float32")
                yield pdf
                continue
            qs = pdf[query_col].fillna("").astype(str).tolist()
            ds = pdf[doc_col].fillna("").astype(str).tolist()
            logits = be.rerank(qs, ds)
            pdf = pdf.copy()
            # sigmoid of first logit (pipelines.rb:1066)
            pdf["score"] = sigmoid(logits).astype("float32")
            yield pdf

    scored = spread_scan(df).mapInPandas(infer, schema=schema)
    keys = group_cols if group_cols is not None else [query_col]
    # tie-break: score desc, doc text asc, then EVERY remaining input
    # column — duplicate texts (the corpus has exact dups by design)
    # would otherwise get run-dependent ranks
    tie_cols = [doc_col] + [
        f.name for f in df.schema.fields if f.name not in (doc_col, "score")
    ]
    w = Window.partitionBy(*keys).orderBy(
        F.desc("score"), *[F.col(c) for c in tie_cols]
    )
    scored = scored.withColumn("rank", F.row_number().over(w))
    if top_k:
        scored = scored.filter(F.col("rank") <= top_k)
    return scored
