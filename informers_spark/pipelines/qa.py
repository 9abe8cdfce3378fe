"""Question-answering and fill-mask pipelines as DataFrame transforms.

question_answering (reference: lib/informers/pipelines.rb:228-278):
tokenize (question, context pair) → forward → softmax(start_logits),
softmax(end_logits) → cartesian start×end with start<=end → score =
p_start · p_end → top_k → decode span. The start×end product stays
inside the UDF (≤ seq² per row), exactly like the reference.

fill_mask (reference: lib/informers/pipelines.rb:280-312): locate the
mask token (error if absent) → softmax over vocab at that position →
top-5 (token, score, filled sequence).

Backends provide the logits; the deterministic hash backend scores
context tokens by question-token overlap (QA) and a fixed mini-vocab by
embedding cosine (fill-mask), so post-processing semantics are exercised
for real offline.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from informers_spark.functions.kernels import softmax


def question_answering(
    df: DataFrame,
    question_col: str = "question",
    context_col: str = "context",
    top_k: int = 1,
    backend: str = "auto",
    backend_opts: dict | None = None,
) -> DataFrame:
    """Append (answer, qa_score, answer_start, answer_end) per row
    (top_k>1 → multiple rows per input)."""
    opts = backend_opts or {}
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("answer", T.StringType()),
            T.StructField("qa_score", T.FloatType()),
            T.StructField("answer_start", T.IntegerType()),
            T.StructField("answer_end", T.IntegerType()),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from informers_spark.backend.base import get_backend
        from informers_spark.backend.hash_backend import tokenize_with_offsets

        be = get_backend(backend, **opts)
        for pdf in batches:
            src_idx, answers, scores, starts, ends = [], [], [], [], []
            for row_i in range(len(pdf)):
                question = str(pdf.iloc[row_i][question_col] or "")
                context = str(pdf.iloc[row_i][context_col] or "")
                toks = tokenize_with_offsets(context)
                if not toks:
                    continue
                start_logits, end_logits = be.qa_logits(question, context, toks)
                p_start = softmax(start_logits)
                p_end = softmax(end_logits)
                # cartesian start×end, start<=end, window cap like HF
                cands = []
                n = len(toks)
                for s in range(n):
                    for e in range(s, min(s + 15, n)):
                        cands.append((float(p_start[s] * p_end[e]), s, e))
                cands.sort(key=lambda x: (-x[0], x[1], x[2]))
                for score, s, e in cands[:top_k]:
                    cs, ce = toks[s][1], toks[e][2]
                    src_idx.append(row_i)
                    answers.append(context[cs:ce])
                    scores.append(np.float32(score))
                    starts.append(np.int32(cs))
                    ends.append(np.int32(ce))
            out = pdf.take(src_idx)[in_cols].reset_index(drop=True)
            out["answer"] = pd.Series(answers, dtype=object)
            out["qa_score"] = np.asarray(scores, dtype=np.float32)
            out["answer_start"] = np.asarray(starts, dtype=np.int32)
            out["answer_end"] = np.asarray(ends, dtype=np.int32)
            yield out

    return df.mapInPandas(infer, schema=schema)


def fill_mask(
    df: DataFrame,
    text_col: str = "text",
    mask_token: str = "[MASK]",
    top_k: int = 5,
    backend: str = "auto",
    backend_opts: dict | None = None,
) -> DataFrame:
    """Explode each masked text into top_k (token_str, fm_score, sequence)
    rows. Rows without the mask token raise, matching the reference
    (pipelines.rb:289-291)."""
    opts = backend_opts or {}
    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("token_str", T.StringType()),
            T.StructField("fm_score", T.FloatType()),
            T.StructField("sequence", T.StringType()),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from informers_spark.backend.base import get_backend

        be = get_backend(backend, **opts)
        for pdf in batches:
            src_idx, toks_out, scores, seqs = [], [], [], []
            for row_i in range(len(pdf)):
                text = str(pdf.iloc[row_i][text_col] or "")
                if mask_token not in text:
                    raise ValueError("Mask token not found in text")
                vocab, logits = be.mask_logits(text, mask_token)
                probs = softmax(logits)
                order = np.argsort(-probs, kind="stable")[:top_k]
                for j in order:
                    src_idx.append(row_i)
                    toks_out.append(vocab[j])
                    scores.append(np.float32(probs[j]))
                    seqs.append(text.replace(mask_token, vocab[j]))
            out = pdf.take(src_idx)[in_cols].reset_index(drop=True)
            out["token_str"] = pd.Series(toks_out, dtype=object)
            out["fm_score"] = np.asarray(scores, dtype=np.float32)
            out["sequence"] = pd.Series(seqs, dtype=object)
            yield out

    return df.mapInPandas(infer, schema=schema)
