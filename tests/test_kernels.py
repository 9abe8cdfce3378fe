"""Unit parity tests of the numpy kernels against hand-computed values
replicating the reference semantics (SURVEY.md §5: tensor.rb / math.rb /
pipelines.rb BIO rules)."""

import math

import numpy as np
import pytest

from informers_spark.functions.kernels import (
    get_top_items,
    group_entities,
    mean_pooling,
    normalize,
    sigmoid,
    softmax,
)


def test_softmax_matches_reference_semantics():
    # max-subtracted exp-normalize (utils/math.rb:73-87)
    x = np.array([1.0, 2.0, 3.0])
    out = softmax(x)
    denom = sum(math.exp(v - 3.0) for v in [1.0, 2.0, 3.0])
    assert out == pytest.approx([math.exp(v - 3.0) / denom for v in [1.0, 2.0, 3.0]])
    assert out.sum() == pytest.approx(1.0)


def test_sigmoid():
    assert sigmoid(np.array([0.0]))[0] == pytest.approx(0.5)
    assert sigmoid(np.array([4.0]))[0] == pytest.approx(1 / (1 + math.exp(-4)))


def test_get_top_items_k_and_all():
    scores = np.array([0.1, 0.7, 0.2])
    assert get_top_items(scores, 2) == [(1, pytest.approx(0.7)), (2, pytest.approx(0.2))]
    assert [i for i, _ in get_top_items(scores, 0)] == [1, 2, 0]


def test_mean_pooling_integer_mask_denominator():
    # parity-critical: denominator is the raw token count (tensor.rb:12-14)
    h = np.array([[[2.0, 4.0], [6.0, 8.0], [100.0, 100.0]]], dtype=np.float32)
    mask = np.array([[1, 1, 0]])
    out = mean_pooling(h, mask)
    assert out[0].tolist() == [4.0, 6.0]


def test_normalize_l2():
    v = np.array([[3.0, 4.0]], dtype=np.float32)
    out = normalize(v)
    assert out[0].tolist() == pytest.approx([0.6, 0.8])


def _ent(entity, score, word, start, end):
    return {"entity": entity, "score": score, "word": word, "start": start, "end": end}


def test_bio_grouping_merges_continuations():
    ents = [
        _ent("B-PER", 0.9, "Mat", 8, 11),
        _ent("I-PER", 0.8, "z", 11, 12),
    ]
    groups = group_entities(ents)
    assert len(groups) == 1
    g = groups[0]
    # group score = arithmetic mean (pipelines.rb:168); span first..last
    assert g["entity_group"] == "PER"
    assert g["score"] == pytest.approx(0.85)
    assert g["start"] == 8 and g["end"] == 12


def test_bio_adjacent_b_tags_do_not_merge():
    # two adjacent B- of the same tag do NOT merge (pipelines.rb:209)
    ents = [_ent("B-PER", 0.9, "Anna", 0, 4), _ent("B-PER", 0.8, "Bob", 5, 8)]
    assert len(group_entities(ents)) == 2


def test_bio_unprefixed_tag_is_continuation():
    # non-prefixed tags default to I-continuation (pipelines.rb:186-188)
    ents = [_ent("B-ORG", 0.9, "Apache", 0, 6), _ent("ORG", 0.7, "Spark", 7, 12)]
    groups = group_entities(ents)
    assert len(groups) == 1
    assert groups[0]["word"] == "Apache Spark"


def test_bio_tag_change_splits():
    ents = [_ent("B-ORG", 0.9, "Apache", 0, 6), _ent("I-LOC", 0.7, "Tokyo", 7, 12)]
    assert len(group_entities(ents)) == 2


def test_join_wordpiece_merges_continuations():
    from informers_spark.functions.kernels import join_wordpiece

    assert join_wordpiece(["Gith", "##ub"]) == "Github"
    assert join_wordpiece(["New", "York"]) == "New York"
    assert join_wordpiece(["Mo", "##zil", "##la", "Corp"]) == "Mozilla Corp"


def test_wordpiece_tokenizer_longest_match_offsets():
    from informers_spark.functions.wordpiece import WordPieceTokenizer

    tok = WordPieceTokenizer(["git", "##hub", "##h", "##ub", "is", "a", "##b"])
    # greedy longest-match: 'github' -> git + ##hub (not ##h ##ub)
    got = tok.tokenize_with_offsets("github is")
    assert got == [("git", 0, 3), ("##hub", 3, 6), ("is", 7, 9)]
    # unmatched word -> single UNK spanning the word
    got = tok.tokenize_with_offsets("github zzz is")
    assert ("[UNK]", 7, 10) in got
    # truncation at max_tokens SUBWORDS, not words
    got = tok.tokenize_with_offsets("github github github", max_tokens=3)
    assert len(got) == 3 and got[2][0] == "git"


def test_ner_bio_merge_with_subword_inputs(spark):
    """Subword pieces of one gazetteer word must merge back into the full
    word (B-ORG + I-ORG continuations -> one mention, word detokenized via
    join_wordpiece) — the reference's convert_tokens_to_string path
    (tokenizers.rb:125-127, pipelines.rb:160-174)."""
    from informers_spark.pipelines.ner import ner

    vocab = ("git", "##hub", "lon", "##don", "runs", "on", "ru", "##by")
    df = spark.createDataFrame([(0, "Github runs on Ruby in London")], ["id", "text"])
    out = ner(df, backend="hash", backend_opts={"vocab": vocab}).collect()
    by_word = {r.word: r for r in out}
    g = by_word["github"]  # merged across git + ##hub (uncased vocab -> lowercase word)
    assert g.entity_group == "ORG" and g.start == 0 and g.end == 6
    r = by_word["ruby"]
    assert r.entity_group == "ORG" and r.start == 15 and r.end == 19
    l = by_word["london"]
    assert l.entity_group == "LOC" and l.start == 23 and l.end == 29
    assert len(out) == 3  # no stray per-piece mentions


def test_interpolate_matches_reference_scalar_loop():
    """Vectorized bilinear resize vs a direct transcription of the
    reference's scalar loop (math.rb:3-71): identical to the last ulp."""
    import numpy as np

    from informers_spark.functions.kernels import interpolate

    def reference_loop(data, out_h, out_w):
        c, h, w = data.shape
        out = np.zeros((c, out_h, out_w))
        x_scale, y_scale = out_w / w, out_h / h
        for i in range(out_h):
            for j in range(out_w):
                x = (j + 0.5) / x_scale - 0.5
                y = (i + 0.5) / y_scale - 0.5
                x1, y1 = int(np.floor(x)), int(np.floor(y))
                x2, y2 = min(x1 + 1, w - 1), min(y1 + 1, h - 1)
                x1, y1 = max(x1, 0), max(y1, 0)
                s, t = x - x1, y - y1
                for k in range(c):
                    out[k, i, j] = (
                        (1 - s) * (1 - t) * data[k, y1, x1]
                        + s * (1 - t) * data[k, y1, x2]
                        + (1 - s) * t * data[k, y2, x1]
                        + s * t * data[k, y2, x2]
                    )
        return out

    rng = np.random.Generator(np.random.PCG64(11))
    img = rng.random((3, 7, 5))
    for oh, ow in [(14, 10), (3, 3), (7, 5), (1, 1), (16, 2)]:
        got = interpolate(img, oh, ow)
        exp = reference_loop(img, oh, ow)
        assert np.allclose(got, exp, rtol=0, atol=1e-12), (oh, ow)
    # hand value: 2x upscale of [[0, 1]] -> half-pixel centers give
    # [0, 0.25, 0.75, 1]
    tiny = np.array([[[0.0, 1.0]]])
    assert np.allclose(interpolate(tiny, 1, 4)[0, 0], [0.0, 0.25, 0.75, 1.0])
