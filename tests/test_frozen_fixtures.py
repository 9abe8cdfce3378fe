"""Frozen deterministic-backend fixtures (FIXTURES.md §2): the hash
backend stands in for the pinned public ONNX models offline, so its
outputs are part of the engine's contract — oracle-free queries and
cross-round comparisons rely on them never drifting. Values regenerated
once and pinned (the reference pins golden model outputs the same way,
/root/reference/test/pipeline_test.rb:115-121)."""

import numpy as np
import pytest

from informers_spark.backend.hash_backend import HashBackend
from informers_spark.functions.kernels import mean_pooling, normalize, softmax

# reference fixture sentences (pipeline_test.rb:115-121)
SENTENCES = ["This is an example sentence", "Each sentence is converted"]
FROZEN_EMB = {
    0: [0.130959, -0.404834, 0.018184],
    1: [0.049419, -0.174492, 0.087474],
}


def test_embedding_first_dims_frozen():
    be = HashBackend()
    h, m = be.encode(SENTENCES)
    v = normalize(mean_pooling(h, m))
    for i, exp in FROZEN_EMB.items():
        got = [float(x) for x in v[i][:3]]
        assert got == pytest.approx(exp, abs=1e-5)


def test_sentiment_frozen():
    # reference fixture text (pipeline_test.rb:27-42)
    be = HashBackend()
    logits, labels = be.classify(["I love transformers!"])
    arg = int(np.argmax(logits[0]))
    assert labels[arg] == "POSITIVE"
    assert float(softmax(logits[0])[arg]) == pytest.approx(0.880797, abs=1e-5)


def test_token_vectors_stable_across_instances():
    a, b = HashBackend(), HashBackend()
    va, _ = a.encode(["spark"])
    vb, _ = b.encode(["spark"])
    assert np.array_equal(va, vb)
