"""As-of join semantics, API facade, QA/fill-mask pipelines."""

import pytest
from pyspark.sql import functions as F

from informers_spark.api import pipeline
from informers_spark.operators.asof import asof_join
from informers_spark.pipelines.qa import fill_mask, question_answering


def test_asof_backward_join_with_tie_rule(spark):
    left = spark.createDataFrame(
        [(1, 5, "e1"), (1, 10, "e2"), (1, 2, "e0"), (2, 7, "e3")],
        ["key", "ts", "name"],
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 8, 200.0), (2, 9, 300.0)], ["key", "ts", "px"]
    )
    out = {r.name: r.px_r for r in asof_join(left, right, on="ts", by="key").collect()}
    # equal ts is visible (ts_r <= ts_l); no prior right row → null
    assert out == {"e0": None, "e1": 100.0, "e2": 200.0, "e3": None}


def test_asof_no_by_key(spark):
    left = spark.createDataFrame([(10,), (1,)], ["ts"])
    right = spark.createDataFrame([(5, "a")], ["ts", "v"])
    rows = {r.ts: r.v_r for r in asof_join(left, right, on="ts").collect()}
    assert rows == {10: "a", 1: None}


def test_api_facade_task_dispatch(spark):
    df = spark.createDataFrame([(0, "I love this great fast engine")], ["id", "text"])
    clf = pipeline("sentiment-analysis", backend="hash")
    assert clf.task == "text-classification"
    out = clf(df).collect()[0]
    assert out.label == "POSITIVE"

    emb = pipeline("embedding", backend="hash")(df).collect()[0]
    norm = sum(x * x for x in emb.embedding)
    assert norm == pytest.approx(1.0, abs=1e-5)


def test_api_out_of_scope_raises():
    # only whisper ASR remains out (raises Todo upstream too)
    with pytest.raises(NotImplementedError, match="pipelines.rb"):
        pipeline("automatic-speech-recognition")
    with pytest.raises(ValueError):
        pipeline("no-such-task")


def test_question_answering_extracts_matching_span(spark):
    df = spark.createDataFrame(
        [(0, "where is the library", "the books live in the library downtown")],
        ["id", "question", "context"],
    )
    out = question_answering(df, backend="hash").collect()
    assert len(out) == 1
    assert "library" in out[0].answer
    assert out[0].qa_score > 0
    ctx = "the books live in the library downtown"
    assert ctx[out[0].answer_start:out[0].answer_end] == out[0].answer


def test_fill_mask_returns_topk_and_requires_mask(spark):
    df = spark.createDataFrame([(0, "ruby is a great [MASK]")], ["id", "text"])
    rows = fill_mask(df, backend="hash").collect()
    assert len(rows) == 5
    assert all("[MASK]" not in r.sequence for r in rows)
    scores = [r.fm_score for r in rows]
    assert scores == sorted(scores, reverse=True)

    bad = spark.createDataFrame([(0, "no mask here")], ["id", "text"])
    with pytest.raises(Exception, match="Mask token"):
        fill_mask(bad, backend="hash").collect()


def test_embed_binary_quantization(spark):
    from informers_spark.pipelines.embed import embed

    df = spark.createDataFrame([(0, "alpha beta gamma")], ["id", "text"])
    out = embed(df, backend="hash", quantize="binary").collect()[0]
    assert set(out.embedding) <= {1, -1}
    ub = embed(df, backend="hash", quantize="ubinary").collect()[0]
    assert len(ub.embedding) == 8  # 64 sign bits packed into 8 bytes
    assert all(0 <= b <= 255 for b in ub.embedding)
