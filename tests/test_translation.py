"""NLLB/M2M100 translation-input construction vs fabricated lang-code
tables (reference: lib/informers/tokenizers.rb:181-245)."""

import pytest

from informers_spark.functions.translation import (
    LangSpec,
    build_translation_inputs,
    m2m100_spec,
    nllb_spec,
)


def test_nllb_spec_filters_codes_identity_token():
    # NLLB special tokens mix lang codes with control tokens
    # (tokenizers.rb:186-189): regex ^[a-z]{3}_[A-Z][a-z]{3}$
    toks = ["<s>", "fra_Latn", "eng_Latn", "</s>", "zho_Hans", "not_a_code", "A_b"]
    spec = nllb_spec(toks)
    assert spec.language_codes == ["fra_Latn", "eng_Latn", "zho_Hans"]
    assert spec.lang_to_token("fra_Latn") == "fra_Latn"  # identity


def test_m2m100_spec_strips_and_rewraps():
    # intended JS slice(2,-2) semantics; the Ruby port's
    # String#slice(2, -2) returns nil (upstream bug, documented in
    # functions/translation.py)
    toks = ["__en__", "__fr__", "__zho__", "<pad>", "__X__"]
    spec = m2m100_spec(toks)
    assert spec.language_codes == ["en", "fr", "zho"]
    assert spec.lang_to_token("fr") == "__fr__"


def test_build_translation_inputs_forces_bos():
    spec = m2m100_spec(["__en__", "__fr__"])
    vocab = {"__en__": 7, "__fr__": 9}
    gk = {}
    out = build_translation_inputs(
        spec, gk, lambda ts: [vocab[t] for t in ts], src_lang="en", tgt_lang="fr"
    )
    assert out is gk and gk["forced_bos_token_id"] == 9


def test_invalid_codes_raise_reference_errors():
    spec = nllb_spec(["fra_Latn", "eng_Latn"])
    conv = lambda ts: [0]
    with pytest.raises(ValueError, match=r"Target language code 'xx' is not valid"):
        build_translation_inputs(spec, {}, conv, tgt_lang="xx")
    with pytest.raises(ValueError, match=r"Source language code 'yy' is not valid"):
        build_translation_inputs(
            spec, {}, conv, src_lang="yy", tgt_lang="fra_Latn"
        )
    # src_lang optional: nil skips source validation (tokenizers.rb:231-236)
    gk = build_translation_inputs(spec, {}, conv, tgt_lang="eng_Latn")
    assert "forced_bos_token_id" in gk


def test_malformed_spec_attribute_errors():
    conv = lambda ts: [0]
    bad = LangSpec(language_regex=None, language_codes="nope", lang_to_token=None)
    with pytest.raises(ValueError, match="language_codes"):
        build_translation_inputs(bad, {}, conv, tgt_lang="fr")
    bad2 = LangSpec(language_regex=None, language_codes=["fr"], lang_to_token=str)
    with pytest.raises(ValueError, match="language_regex"):
        build_translation_inputs(bad2, {}, conv, tgt_lang="fr")
    bad3 = LangSpec(
        language_regex=__import__("re").compile("x"),
        language_codes=["fr"],
        lang_to_token="not callable",
    )
    with pytest.raises(ValueError, match="lang_to_token"):
        build_translation_inputs(bad3, {}, conv, tgt_lang="fr")


def test_translate_pipeline_forces_target_token(spark):
    # e2e over the hash backend: an M2M100-style spec whose codes map
    # onto GEN_VOCAB entries; the first generated token must be the
    # forced target-lang token for every row
    from informers_spark.backend.hash_backend import HashBackend
    from informers_spark.pipelines.generate import translate

    vocab = list(HashBackend().GEN_VOCAB)
    tgt_word = vocab[3]
    spec = LangSpec(
        language_regex=__import__("re").compile(r"^[a-z]+$"),
        language_codes=["en", "fr"],
        lang_to_token={"en": vocab[2], "fr": tgt_word}.__getitem__,
    )
    df = spark.createDataFrame(
        [(0, "the fast table"), (1, "a slow bug crawls")], ["id", "text"]
    )
    out = translate(
        df,
        src_lang="en",
        tgt_lang="fr",
        lang_spec=spec,
        convert_tokens_to_ids=lambda ts: [vocab.index(t) for t in ts],
        backend="hash",
        max_new_tokens=4,
    ).collect()
    for r in out:
        assert r.generated_text.split()[0] == tgt_word
    # invalid code raises driver-side, before any job runs
    with pytest.raises(ValueError, match="not valid"):
        translate(
            df, tgt_lang="zz", lang_spec=spec,
            convert_tokens_to_ids=lambda ts: [0], backend="hash",
        )
