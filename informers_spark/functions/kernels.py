"""Vectorized (numpy) kernels with reference-parity semantics.

The reference implements these as scalar Ruby loops; we vectorize with
numpy inside Arrow-batched UDFs — the headline win of the Spark design
(the reference explicitly notes it cannot vectorize,
reference: lib/informers/utils/generation.rb:173-174).

Parity notes cite the reference file:line whose semantics each kernel
replicates. Used inside mapInPandas inference UDFs; never row-at-a-time.
"""

from __future__ import annotations

import numpy as np


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Max-subtracted exp-normalize (reference: lib/informers/utils/math.rb:73-87)."""
    x = np.asarray(x, dtype=np.float64)
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def sigmoid(x: np.ndarray) -> np.ndarray:
    """Elementwise logistic (reference: lib/informers/utils/math.rb:89-94)."""
    return 1.0 / (1.0 + np.exp(-np.asarray(x, dtype=np.float64)))


def get_top_items(scores: np.ndarray, top_k: int = 0) -> list[tuple[int, float]]:
    """Argsort desc, take k, return (index, score) pairs; k<=0 → all
    (reference: lib/informers/utils/math.rb:96-108)."""
    scores = np.asarray(scores)
    order = np.argsort(-scores, kind="stable")
    if top_k and top_k > 0:
        order = order[:top_k]
    return [(int(i), float(scores[i])) for i in order]


def mean_pooling(last_hidden: np.ndarray, attention_mask: np.ndarray) -> np.ndarray:
    """Mask-weighted mean over the sequence dim.

    Parity-critical: the denominator is the raw integer token count
    (sum of the mask), NOT clamped — matches
    reference: lib/informers/utils/tensor.rb:3-17.

    last_hidden: [batch, seq, hidden] float32
    attention_mask: [batch, seq] int
    returns [batch, hidden] float32
    """
    mask = np.asarray(attention_mask, dtype=np.float32)[:, :, None]
    h = np.asarray(last_hidden, dtype=np.float32)
    summed = (h * mask).sum(axis=1)
    counts = mask.sum(axis=1)
    return summed / counts


def normalize(v: np.ndarray, axis: int = -1) -> np.ndarray:
    """L2 row-normalize v / sqrt(sum v^2)
    (reference: lib/informers/utils/tensor.rb:19-24)."""
    v = np.asarray(v, dtype=np.float32)
    n = np.sqrt((v * v).sum(axis=axis, keepdims=True))
    return v / n


def interpolate(data: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear 2-D resize of a CHW tensor, vectorized; exact semantics of
    the reference's scalar loop (lib/informers/utils/math.rb:3-71 via
    utils/tensor.rb:46-62): half-pixel source centers, neighbor indices
    clamped to the image, fractional weights computed against the CLAMPED
    floor (so edge pixels extrapolate exactly like the reference).

    data: [C, H, W] float; → [C, out_h, out_w] float64.
    """
    data = np.asarray(data, dtype=np.float64)
    c, h, w = data.shape
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    x1 = np.maximum(np.floor(xs), 0).astype(np.int64)
    y1 = np.maximum(np.floor(ys), 0).astype(np.int64)
    x2 = np.minimum(np.floor(xs) + 1, w - 1).astype(np.int64)
    y2 = np.minimum(np.floor(ys) + 1, h - 1).astype(np.int64)
    s = xs - x1  # vs clamped floor, per the reference
    t = ys - y1
    w1 = np.outer(1 - t, 1 - s)  # [out_h, out_w]
    w2 = np.outer(1 - t, s)
    w3 = np.outer(t, 1 - s)
    w4 = np.outer(t, s)
    return (
        w1 * data[:, y1[:, None], x1[None, :]]
        + w2 * data[:, y1[:, None], x2[None, :]]
        + w3 * data[:, y2[:, None], x1[None, :]]
        + w4 * data[:, y2[:, None], x2[None, :]]
    )


def _get_tag(entity_name: str) -> tuple[str, str]:
    """Split 'B-PER' → ('B','PER'); non-prefixed tags default to I-continuation
    (reference: lib/informers/pipelines.rb:176-190)."""
    if entity_name.startswith("B-"):
        return "B", entity_name[2:]
    if entity_name.startswith("I-"):
        return "I", entity_name[2:]
    return "I", entity_name


def join_wordpiece(words: list[str]) -> str:
    """convert_tokens_to_string for WordPiece vocabularies: space-join,
    then fuse '##' continuation pieces onto their word
    (reference: lib/informers/tokenizers.rb:125-127 — the tokenizer's
    decoder does this merge). For non-subword tokens this is exactly
    ' '.join, so it is safe as the universal NER join."""
    return " ".join(words).replace(" ##", "")


def group_entities(
    entities: list[dict],
    join_word=join_wordpiece,
) -> list[dict]:
    """BIO merge of token-level entities into grouped spans.

    Sequential, order-dependent scan — must run within one document, never
    as a distributed aggregate. Semantics replicated exactly from
    reference: lib/informers/pipelines.rb:192-225 and :160-174:
      - merge consecutive tokens when same tag AND current prefix != 'B'
        (two adjacent B- of the same tag do NOT merge, pipelines.rb:209)
      - group score = arithmetic mean of member scores (pipelines.rb:168)
      - word = detokenized member words, span = first start / last end

    entities: [{entity, score, word, start, end}, ...] token-level, in order.
    join_word: detokenizer (reference uses convert_tokens_to_string).
    """
    groups: list[dict] = []
    current: list[dict] = []
    current_tag: str | None = None

    def flush():
        if not current:
            return
        scores = [e["score"] for e in current]
        groups.append(
            {
                "entity_group": current_tag,
                "score": float(sum(scores) / len(scores)),
                "word": join_word([e["word"] for e in current]),
                "start": current[0]["start"],
                "end": current[-1]["end"],
            }
        )

    for ent in entities:
        prefix, tag = _get_tag(ent["entity"])
        if current and tag == current_tag and prefix != "B":
            current.append(ent)
        else:
            flush()
            current = [ent]
            current_tag = tag
    flush()
    return groups
