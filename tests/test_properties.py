"""Property-based tests (hypothesis) for the pure kernels — invariants
that hand-picked examples can miss."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from informers_spark.functions.generation import NoRepeatNGramLogitsProcessor
from informers_spark.functions.kernels import (
    group_entities,
    interpolate,
    normalize,
    softmax,
)
from informers_spark.functions.wordpiece import WordPieceTokenizer, default_vocab

words = st.text(alphabet="abcdefghij", min_size=1, max_size=12)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(-50, 50), min_size=1, max_size=32))
def test_softmax_is_a_distribution(xs):
    p = softmax(np.array(xs))
    assert np.all(p >= 0) and abs(p.sum() - 1.0) < 1e-9
    # order-preserving up to rounding ties: the logits argmax always
    # attains the probability maximum (indices may differ only on ties)
    assert p[int(np.argmax(xs))] == p.max()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.floats(-10, 10), min_size=2, max_size=64).filter(
        lambda v: max(abs(x) for x in v) > 1e-3  # f32 sum-of-squares must not underflow
    )
)
def test_normalize_unit_norm(xs):
    v = normalize(np.array([xs], dtype=np.float32))
    assert abs(float((v * v).sum()) - 1.0) < 1e-4


@settings(max_examples=50, deadline=None)
@given(st.lists(words, min_size=1, max_size=20))
def test_wordpiece_offsets_reconstruct_text(ws):
    tok = WordPieceTokenizer(default_vocab())
    text = " ".join(ws)
    pieces = tok.tokenize_with_offsets(text)
    # spans are monotone, in-bounds, and each piece matches its span
    prev_end = 0
    for p, s, e in pieces:
        assert 0 <= s < e <= len(text) and s >= prev_end - 0  # non-overlapping words
        if not p.startswith("##") and p != tok.unk_token:
            assert text[s:e].lower().startswith(p[:1])
        prev_end = s
    # joining the pieces of each word (strip ##) reproduces the word
    # (the default vocab covers all 1-2 char lowercase pieces -> no UNK)
    rebuilt = "".join(p[2:] if p.startswith("##") else " " + p for p in
                      (x[0] for x in pieces)).strip()
    assert rebuilt == text.lower()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["B", "I"]), st.sampled_from(["PER", "ORG", "LOC"])),
        min_size=1,
        max_size=30,
    )
)
def test_group_entities_partitions_all_tokens(tags):
    ents = [
        {"entity": f"{p}-{t}", "score": 1.0, "word": f"w{i}", "start": i * 2, "end": i * 2 + 1}
        for i, (p, t) in enumerate(tags)
    ]
    groups = group_entities(ents)
    # every token lands in exactly one group, groups hold contiguous runs
    total_words = sum(len(g["word"].split()) for g in groups)
    assert total_words == len(ents)
    # every B opens a group: group count == B count + I-runs that start
    # the sequence or follow a different tag
    n_b = sum(1 for p, _ in tags if p == "B")
    assert len(groups) >= max(n_b, 1)
    for g in groups:
        assert g["start"] <= g["end"]


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 5), st.integers(1, 9), st.integers(1, 9))
def test_interpolate_identity_at_same_size(c, h, w):
    rng = np.random.Generator(np.random.PCG64(3))
    img = rng.random((c, h, w))
    out = interpolate(img, h, w)
    assert np.allclose(out, img, atol=1e-12)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 5), min_size=0, max_size=20), st.integers(2, 4))
def test_no_repeat_ngram_never_bans_unseen(ids, n):
    p = NoRepeatNGramLogitsProcessor(n)
    logits = np.zeros(7)
    out = p(list(ids), logits.copy())
    banned = {i for i in range(7) if out[i] == -np.inf}
    # a banned token must actually complete a seen n-gram
    for t in banned:
        seq = list(ids) + [t]
        ngrams = [tuple(seq[j : j + n]) for j in range(len(seq) - n + 1)]
        assert ngrams and ngrams[-1] in ngrams[:-1]


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 8), st.integers(0, 40))
def test_reflect_offset_bounds_and_period(w, i):
    from informers_spark.functions.vision import calculate_reflect_offset

    off = int(calculate_reflect_offset(i, w))
    assert 0 <= off <= w  # always a valid source index for length w+1
    # period 2w (the symmetric reflection cycle)
    assert off == int(calculate_reflect_offset(i + 2 * w, w))


@settings(max_examples=30, deadline=None)
@given(st.integers(3, 12), st.integers(3, 12), st.integers(1, 3))
def test_pad_image_preserves_original_region(h, w, c):
    from informers_spark.functions.vision import pad_image

    rng = np.random.Generator(np.random.PCG64(h * 100 + w))
    img = rng.random((h, w, c))
    for mode in ("constant", "symmetric"):
        out = pad_image(img, w + 3, h + 2, mode=mode)
        assert out.shape == (h + 2, w + 3, c)
        assert np.array_equal(out[:h, :w], img)


@settings(max_examples=30, deadline=None)
@given(st.integers(2, 10), st.integers(2, 10))
def test_resize_size_never_exceeds_longest_edge(sw, sh):
    from informers_spark.functions.vision import get_resize_output_image_size

    w, h = get_resize_output_image_size(
        sw * 37, sh * 41, {"shortest_edge": 64, "longest_edge": 100}
    )
    assert max(w, h) <= 100


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 4), st.integers(2, 6))
def test_detection_probs_bounded_and_background_dropped(b, nb):
    from informers_spark.functions.vision import post_process_object_detection

    rng = np.random.Generator(np.random.PCG64(b * 10 + nb))
    logits = rng.standard_normal((b, nb, 5))
    boxes = rng.uniform(0.1, 0.9, (b, nb, 4))
    for det in post_process_object_detection(logits, boxes, 0.5):
        assert all(0.0 <= s <= 1.0 for s in det["scores"])
        assert all(k != 4 for k in det["classes"])  # background id dropped


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(0, 30), st.integers(0, 30), st.integers(0, 30))
def test_simhash_banding_pigeonhole_recall(base_hash, f1, f2, f3):
    # the recall contract simhash_neardup documents: two hashes within
    # hamming < bands MUST agree on at least one of the band slices
    bits, bands = 31, 4
    width = (bits + bands - 1) // bands
    other = base_hash
    for f in {f1, f2, f3}:  # flip up to 3 distinct bits -> hamming <= 3
        other ^= 1 << f
    slices_agree = any(
        (base_hash >> (i * width)) & ((1 << width) - 1)
        == (other >> (i * width)) & ((1 << width) - 1)
        for i in range(bands)
    )
    assert slices_agree
