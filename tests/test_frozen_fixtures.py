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


# --- fixture-oracle pins (tools/freeze_fixtures.py) -------------------------
# The driver's DuckDB oracle for the md5-seeded queries is a frozen parquet
# of our own Spark output at sf0.01; these tests re-run the live queries and
# assert equality, so a silent semantics change fails CI before it reaches
# the driver's correctness gate.

import os

import pandas as pd

from informers_spark.queries import FIXTURE_DIR, FIXTURE_QUERIES, QUERIES

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", FIXTURE_QUERIES)
def test_fixture_oracle_reproduces(spark, name):
    frozen = pd.read_parquet(os.path.join(FIXTURE_DIR, f"{name}.parquet"))
    live = QUERIES[name](spark, SF_DIR).toPandas()
    cols = sorted(frozen.columns)
    assert sorted(live.columns) == cols
    f = frozen[cols].sort_values(cols).reset_index(drop=True)
    l = live[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(f, l, check_dtype=False)


def test_parse_model_config():
    # fabricated config.json fixture: id2label keys are JSON strings in
    # arbitrary order; parse must return an index-ordered list
    # (reference: configs.rb:19-42, models.rb:1223-1495)
    from informers_spark.backend.model_config import parse_model_config

    cfg = {
        "model_type": "bert",
        "id2label": {"1": "B-PER", "0": "O", "10": "I-LOC", "2": "I-PER",
                     "3": "B-ORG", "4": "I-ORG", "5": "B-LOC", "6": "B-MISC",
                     "7": "I-MISC", "8": "X1", "9": "X2"},
        "label2id": {"O": 0, "B-PER": 1},
    }
    parsed = parse_model_config(cfg)
    assert parsed["model_type"] == "bert"
    assert parsed["id2label"][0] == "O"
    assert parsed["id2label"][1] == "B-PER"
    assert parsed["id2label"][10] == "I-LOC"  # numeric, not lexicographic, order
    assert parsed["label2id"]["B-PER"] == 1
    assert parse_model_config({})["id2label"] is None
