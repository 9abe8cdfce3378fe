"""Generation kernels vs hand-computed values (reference semantics:
lib/informers/utils/generation.rb) + greedy pipeline behavior."""

import numpy as np
import pytest

from informers_spark.functions.generation import (
    ForcedBOSTokenLogitsProcessor,
    ForceTokensLogitsProcessor,
    MinLengthLogitsProcessor,
    MinNewTokensLengthLogitsProcessor,
    NoBadWordsLogitsProcessor,
    NoRepeatNGramLogitsProcessor,
    RepetitionPenaltyLogitsProcessor,
    build_processors,
    greedy_sample,
)


def test_greedy_sample_first_index_wins_ties():
    # Utils.max returns the first max index (math.rb:110-115)
    assert greedy_sample(np.array([1.0, 3.0, 3.0, 2.0])) == 1


def test_no_repeat_ngram_hand_values():
    # ids [5, 3, 5]: 2-grams seen = (5,3), (3,5); suffix of len 1 = (5,)
    # -> banned continuation after 5 is [3]  (generation.rb:191-248)
    p = NoRepeatNGramLogitsProcessor(2)
    logits = np.zeros(6)
    out = p([5, 3, 5], logits.copy())
    assert out[3] == -np.inf
    assert np.isfinite(out[[0, 1, 2, 4, 5]]).all()

    # too short: len(ids)+1 < n -> no bans (generation.rb:231-234)
    out = NoRepeatNGramLogitsProcessor(3)([7], logits.copy())
    assert np.isfinite(out).all()

    # 3-grams: ids [1,2,3,1,2] -> prefix (1,2) banned continuation [3]
    out = NoRepeatNGramLogitsProcessor(3)([1, 2, 3, 1, 2], logits.copy())
    assert out[3] == -np.inf and np.isfinite(out[4])


def test_min_length_masks_eos_until_reached():
    # generation.rb:250-266: eos -> -inf while len(ids) < min_length
    p = MinLengthLogitsProcessor(3, 5)
    logits = np.ones(6)
    assert p([0, 1], logits.copy())[5] == -np.inf
    assert p([0, 1, 2], logits.copy())[5] == 1.0
    # list-valued eos ids
    p2 = MinLengthLogitsProcessor(2, [4, 5])
    out = p2([0], np.ones(6))
    assert out[4] == -np.inf and out[5] == -np.inf


def test_forced_bos_only_at_first_step():
    # generation.rb:268-280: at len==1 everything -inf except bos (=0)
    p = ForcedBOSTokenLogitsProcessor(2)
    out = p([9], np.ones(4))
    assert out[2] == 0.0 and (out[[0, 1, 3]] == -np.inf).all()
    out = p([9, 2], np.ones(4))
    assert (out == 1.0).all()


def test_build_processors_wiring():
    # reference wiring ORDER, models.rb:353-408: ngram -> min_length ->
    # forced_bos (repetition/bad_words/min_new/forced_decoder off here)
    procs = build_processors(
        eos_token_id=5, min_length=2, no_repeat_ngram_size=2, forced_bos_token_id=1
    )
    assert [type(p).__name__ for p in procs] == [
        "NoRepeatNGramLogitsProcessor",
        "MinLengthLogitsProcessor",
        "ForcedBOSTokenLogitsProcessor",
    ]


def test_build_processors_full_wiring_order():
    # all eight config keys on -> full models.rb:353-408 order
    procs = build_processors(
        eos_token_id=5,
        min_length=2,
        no_repeat_ngram_size=2,
        forced_bos_token_id=1,
        repetition_penalty=1.5,
        bad_words_ids=[[3]],
        min_new_tokens=2,
        forced_eos_token_id=5,
        forced_decoder_ids=[[1, 2]],
    )
    assert [type(p).__name__ for p in procs] == [
        "RepetitionPenaltyLogitsProcessor",
        "NoRepeatNGramLogitsProcessor",
        "NoBadWordsLogitsProcessor",
        "MinLengthLogitsProcessor",
        "MinNewTokensLengthLogitsProcessor",
        "ForcedBOSTokenLogitsProcessor",
        "ForcedEOSTokenLogitsProcessor",
        "ForceTokensLogitsProcessor",
    ]
    # repetition_penalty == 1.0 is the reference's explicit no-wire case
    assert build_processors(eos_token_id=5, repetition_penalty=1.0) == []


def test_repetition_penalty_hand_values():
    # transformers.js semantics (class is wired at models.rb:360-362 but
    # never defined upstream): logit<0 -> *= penalty, else /= penalty
    p = RepetitionPenaltyLogitsProcessor(2.0)
    out = p([0, 2], np.array([4.0, 6.0, -3.0, 1.0]))
    assert out.tolist() == [2.0, 6.0, -6.0, 1.0]
    # a token generated twice is penalized twice (loop over ids)
    out = p([1, 1], np.array([0.0, 8.0]))
    assert out[1] == 2.0


def test_no_bad_words_hand_values():
    logits = np.zeros(6)
    # multi-token bad word [3, 4]: banned only when ids end with prefix 3
    p = NoBadWordsLogitsProcessor([[3, 4]], eos_token_id=5)
    out = p([0, 1, 3], logits.copy())
    assert out[4] == -np.inf
    out = p([0, 3, 1], logits.copy())
    assert np.isfinite(out).all()
    # single-token bad word: zero prefix checks -> always banned
    # (transformers.js loop-guard quirk, transcribed faithfully)
    p1 = NoBadWordsLogitsProcessor([[2]], eos_token_id=5)
    out = p1([0, 1], logits.copy())
    assert out[2] == -np.inf
    # sequence not shorter than ids skips the prefix check -> banned
    p2 = NoBadWordsLogitsProcessor([[9, 9, 4]], eos_token_id=5)
    out = p2([0, 1], logits.copy())
    assert out[4] == -np.inf


def test_min_new_tokens_hand_values():
    # new_tokens = len(ids) - prompt_length_to_skip; eos banned while
    # new_tokens < min_new_tokens (transformers.js semantics; wired at
    # models.rb:376-382, class undefined upstream)
    p = MinNewTokensLengthLogitsProcessor(1, 2, 5)
    assert p([0], np.ones(6))[5] == -np.inf       # 0 new < 2
    assert p([0, 1], np.ones(6))[5] == -np.inf    # 1 new < 2
    assert p([0, 1, 2], np.ones(6))[5] == 1.0     # 2 new, free
    # list-valued eos
    p2 = MinNewTokensLengthLogitsProcessor(0, 1, [4, 5])
    out = p2([], np.ones(6))
    assert out[4] == -np.inf and out[5] == -np.inf


def test_force_tokens_hand_values():
    # force_token_map keyed by len(ids) (transformers.js semantics;
    # wired at models.rb:399-401, class undefined upstream)
    p = ForceTokensLogitsProcessor([[1, 3], [2, 0]])
    out = p([9], np.ones(5))
    assert out[3] == 0.0 and (out[[0, 1, 2, 4]] == -np.inf).all()
    out = p([9, 3], np.ones(5))
    assert out[0] == 0.0 and (out[1:] == -np.inf).all()
    out = p([9, 3, 0], np.ones(5))
    assert (out == 1.0).all()  # no entry for index 3


def test_generate_text_deterministic_and_stops(spark):
    from informers_spark.pipelines.generate import generate_text

    df = spark.createDataFrame(
        [(0, "spark is a fast framework"), (1, "the slow bug was terrible")],
        ["id", "text"],
    )
    out1 = {r.id: r.generated_text for r in generate_text(df, backend="hash").collect()}
    out2 = {r.id: r.generated_text for r in generate_text(df, backend="hash").collect()}
    assert out1 == out2  # deterministic across runs
    assert out1[0] != out1[1]  # context-sensitive
    for v in out1.values():
        assert 0 < len(v.split()) <= 8  # terminated (EOS or max_new_tokens)
        assert "</s>" not in v


def test_generate_min_length_and_ngram_knobs(spark):
    from informers_spark.pipelines.generate import generate_text

    df = spark.createDataFrame([(0, "hash join table")], ["id", "text"])
    short = generate_text(df, backend="hash", max_new_tokens=3).collect()[0].generated_text
    assert len(short.split()) <= 3
    # min_length counts the decoder-start token, so min_length=6 forces
    # at least 5 generated tokens
    long = (
        generate_text(df, backend="hash", min_length=6, max_new_tokens=10)
        .collect()[0]
        .generated_text
    )
    assert len(long.split()) >= 5
    # no-repeat bigrams: no (a, b) bigram may appear twice
    nr = (
        generate_text(df, backend="hash", no_repeat_ngram_size=2, max_new_tokens=10)
        .collect()[0]
        .generated_text.split()
    )
    bigrams = list(zip(nr, nr[1:]))
    assert len(bigrams) == len(set(bigrams))


def test_text_generation_returns_full_text(spark):
    from informers_spark.api import pipeline

    df = spark.createDataFrame([(0, "great code")], ["id", "text"])
    full = pipeline("text-generation", backend="hash")(df).collect()[0].generated_text
    assert full.startswith("great code")
    t2t = pipeline("text2text-generation", backend="hash")(df).collect()[0].generated_text
    assert not t2t.startswith("great code")
    summ = pipeline("summarization", backend="hash")(df).collect()[0]
    assert summ.generated_text  # prefixed task variant runs


def test_beam_sample_hand_values():
    from informers_spark.functions.generation import apply_temperature, beam_sample

    # logits [0, ln2, ln4] -> softmax over top_k=3 = [1/7, 2/7, 4/7];
    # two beams: token 2 (log 4/7), token 1 (log 2/7)
    logits = np.log(np.array([1.0, 2.0, 4.0]))
    beams = beam_sample(logits, num_beams=2, top_k=3)
    assert [t for t, _ in beams] == [2, 1]
    assert beams[0][1] == pytest.approx(np.log(4 / 7))
    assert beams[1][1] == pytest.approx(np.log(2 / 7))
    # top_k cuts the softmax support: with top_k=2 probs renormalize to
    # [2/6, 4/6] over tokens {2, 1}
    beams = beam_sample(logits, num_beams=2, top_k=2)
    assert beams[0][1] == pytest.approx(np.log(4 / 6))
    # temperature divides logits before sampling (generation.rb:96-101)
    assert apply_temperature(np.array([2.0, 4.0]), 2.0).tolist() == [1.0, 2.0]
    assert apply_temperature(np.array([2.0]), 0).tolist() == [2.0]


def test_beam_search_pipeline(spark):
    from informers_spark.pipelines.generate import generate_text

    df = spark.createDataFrame(
        [(0, "spark is a fast framework"), (1, "the slow bug was terrible")],
        ["id", "text"],
    )
    # num_beams=1 via the beam machinery must equal the greedy path:
    # GreedySampler is the 1-beam specialization (generation.rb:105-116)
    greedy = {r.id: r.generated_text for r in generate_text(df, backend="hash").collect()}
    beam1 = {
        r.id: r.generated_text
        for r in generate_text(df, backend="hash", num_beams=2, top_k=1).collect()
    }
    # top_k=1 makes every beam step deterministic-greedy regardless of width
    assert beam1 == greedy
    beams = {
        r.id: r.generated_text
        for r in generate_text(df, backend="hash", num_beams=3).collect()
    }
    b2 = {
        r.id: r.generated_text
        for r in generate_text(df, backend="hash", num_beams=3).collect()
    }
    assert beams == b2  # deterministic
    for v in beams.values():
        assert "</s>" not in v and len(v.split()) <= 8


def test_pad_batch_left_and_right():
    from informers_spark.functions.wordpiece import pad_batch

    ids = [[7, 8, 9], [5]]
    # right pad (encoder default)
    out, mask = pad_batch(ids, pad_id=0, padding_side="right")
    assert out == [[7, 8, 9], [5, 0, 0]]
    assert mask == [[1, 1, 1], [1, 0, 0]]
    # left pad (decoder-only generation, tokenizers.rb:141-143 via
    # pipelines.rb:388): real tokens end at index -1 for every row
    out, mask = pad_batch(ids, pad_id=0, padding_side="left")
    assert out == [[7, 8, 9], [0, 0, 5]]
    assert mask == [[1, 1, 1], [0, 0, 1]]
    assert [r[-1] for r in out] == [9, 5]
    with pytest.raises(ValueError):
        pad_batch(ids, padding_side="top")
    assert pad_batch([], padding_side="left") == ([], [])


def test_generate_batch_equals_row_at_a_time(spark):
    # decoder-only batch parity (VERDICT r02 task 4): a batch of
    # UNEQUAL-length prompts must produce per-row outputs identical to
    # running each prompt alone — padding/batching can never leak into
    # the decode (the reference left-pads for exactly this reason,
    # pipelines.rb:388)
    from informers_spark.pipelines.generate import generate_text

    rows = [
        (0, "a"),
        (1, "spark is a very fast distributed compute framework for big data"),
        (2, "bug"),
        (3, "the quick brown fox jumps over the lazy dog near the bank"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    kwargs = dict(backend="hash", max_new_tokens=6, return_full_text=True,
                  repetition_penalty=1.5)
    batched = {r.id: r.generated_text for r in generate_text(df, **kwargs).collect()}
    for rid, text in rows:
        solo_df = spark.createDataFrame([(rid, text)], ["id", "text"])
        solo = generate_text(solo_df, **kwargs).collect()[0].generated_text
        assert solo == batched[rid], f"row {rid} diverges batched vs solo"


def test_multinomial_sample_seeded_and_distribution():
    from informers_spark.functions.generation import multinomial_sample

    logits = np.array([0.0, 5.0, 1.0, -2.0])
    rng = np.random.default_rng(42)
    out = multinomial_sample(logits, num_beams=3, top_k=4, rng=rng)
    # seeded -> reproducible
    rng2 = np.random.default_rng(42)
    assert out == multinomial_sample(logits, num_beams=3, top_k=4, rng=rng2)
    # every pick carries log p of ITS token; token 1 dominates the mass
    for tok, logp in out:
        assert 0 <= tok < 4 and logp <= 0.0
    picks = [
        t
        for _ in range(50)
        for t, _ in multinomial_sample(logits, 1, 4, np.random.default_rng(_))
    ]
    assert picks.count(1) > 35  # softmax(5) ~ 0.95 of the mass
    # top_k=1 degenerates to greedy
    assert multinomial_sample(logits, 1, 1, np.random.default_rng(0))[0][0] == 1


def test_begin_suppress_tokens_raises_like_upstream_todo():
    with pytest.raises(NotImplementedError, match="models.rb:395-397"):
        build_processors(eos_token_id=5, begin_suppress_tokens=[0, 1])


def test_hash_backend_decode_roundtrip():
    from informers_spark.backend.hash_backend import HashBackend

    be = HashBackend()
    vocab = be.GEN_VOCAB
    ids = be.convert_tokens_to_ids([vocab[0], vocab[3], "</s>"])
    assert ids[:2] == [0, 3] and ids[2] == len(vocab) - 1
    assert be.id_to_token(0) == vocab[0] and be.id_to_token(9999) is None
    assert be.convert_tokens_to_ids(["not-in-vocab"]) == [None]
    # decode skips EOS by default, keeps it when asked
    assert be.decode(ids) == f"{vocab[0]} {vocab[3]}"
    assert be.decode(ids, skip_special_tokens=False).endswith("</s>")
    assert be.batch_decode([ids, ids[:1]]) == [
        f"{vocab[0]} {vocab[3]}",
        vocab[0],
    ]
