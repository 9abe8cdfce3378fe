"""Question-answering and fill-mask pipelines as DataFrame transforms.

question_answering (reference: lib/informers/pipelines.rb:228-278):
tokenize (question, context pair) → forward → softmax(start_logits),
softmax(end_logits) → cartesian start×end with start<=end → score =
p_start · p_end → top_k → decode span. The start×end product stays
inside the UDF (≤ seq² per row), exactly like the reference.

fill_mask (reference: lib/informers/pipelines.rb:280-312): locate the
mask token (error if absent) → softmax over vocab at that position →
top-5 (token, score, filled sequence).

Batching contract: ONE backend call per Arrow batch (`qa_batch` /
`mask_batch`) — the backend owns tokenization, so logits come back
aligned to ITS offsets (the ONNX path slices to context sequence_ids,
mirroring the reference's sep_index filter). No per-row backend calls,
no pandas .iloc row loops; only the inherently per-row start×end
candidate scan runs rowwise, in numpy, like the reference.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from informers_spark.functions.kernels import softmax
from informers_spark.rebalance import spread_scan


def question_answering(
    df: DataFrame,
    question_col: str = "question",
    context_col: str = "context",
    top_k: int = 1,
    max_answer_tokens: int = 15,
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

        be = get_backend(backend, **opts)
        for pdf in batches:
            questions = pdf[question_col].fillna("").astype(str).tolist()
            contexts = pdf[context_col].fillna("").astype(str).tolist()
            src_idx, answers, scores, starts, ends = [], [], [], [], []
            scored = be.qa_batch(questions, contexts) if len(pdf) else []
            for row_i, (context, (start_logits, end_logits, toks)) in enumerate(
                zip(contexts, scored)
            ):
                n = len(toks)
                if n == 0:
                    continue
                p_start = softmax(start_logits)
                p_end = softmax(end_logits)
                # cartesian start×end (start<=end, window-capped like the
                # reference/HF) as one [n, w] outer product — argsorted
                # flat, no Python double loop
                w = min(max_answer_tokens, n)
                # vectorized banded product: cand[s, d] = p_start[s] * p_end[s+d]
                pe_pad = np.concatenate([p_end, np.zeros(w, dtype=p_end.dtype)])
                band = np.stack([pe_pad[d : d + n] for d in range(w)], axis=1)  # [n, w]
                cand = p_start[:, None] * band
                valid = (np.arange(n)[:, None] + np.arange(w)[None, :]) < n
                cand = np.where(valid, cand, -1.0)
                flat_order = np.argsort(-cand, axis=None, kind="stable")[:top_k]
                for fo in flat_order:
                    s, d = divmod(int(fo), w)
                    if cand[s, d] < 0:
                        continue
                    e = s + d
                    cs, ce = toks[s][1], toks[e][2]
                    src_idx.append(row_i)
                    answers.append(context[cs:ce])
                    scores.append(np.float32(cand[s, d]))
                    starts.append(np.int32(cs))
                    ends.append(np.int32(ce))
            out = pdf.take(src_idx)[in_cols].reset_index(drop=True)
            out["answer"] = pd.Series(answers, dtype=object)
            out["qa_score"] = np.asarray(scores, dtype=np.float32)
            out["answer_start"] = np.asarray(starts, dtype=np.int32)
            out["answer_end"] = np.asarray(ends, dtype=np.int32)
            yield out

    return spread_scan(df).mapInPandas(infer, schema=schema)


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
            if len(pdf):
                texts = pdf[text_col].fillna("").astype(str).tolist()
                if any(mask_token not in t for t in texts):
                    raise ValueError("Mask token not found in text")
                vocab, logits = be.mask_batch(texts, mask_token)  # [b, V]
                probs = softmax(logits, axis=-1)
                order = np.argsort(-probs, axis=-1, kind="stable")[:, :top_k]
                for row_i, text in enumerate(texts):
                    for j in order[row_i]:
                        src_idx.append(row_i)
                        toks_out.append(vocab[j])
                        scores.append(np.float32(probs[row_i, j]))
                        seqs.append(text.replace(mask_token, vocab[j]))
            out = pdf.take(src_idx)[in_cols].reset_index(drop=True)
            out["token_str"] = pd.Series(toks_out, dtype=object)
            out["fm_score"] = np.asarray(scores, dtype=np.float32)
            out["sequence"] = pd.Series(seqs, dtype=object)
            yield out

    return spread_scan(df).mapInPandas(infer, schema=schema)
