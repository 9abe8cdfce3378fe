"""NLLB / M2M100 translation-input construction: target-language
validation + forced-BOS wiring (reference: lib/informers/tokenizers.rb:
181-245). The pipeline calls _build_translation_inputs before generate;
its one side effect is generate_kwargs["forced_bos_token_id"] = the
target-lang token id, which ForcedBOSTokenLogitsProcessor then forces at
the first decode step (functions/generation.py).

Upstream-bug note (documented, not reproduced): M2M100Tokenizer derives
its code list with `x.slice(2, -2)` (tokenizers.rb:203-205) — in Ruby,
String#slice(start, negative_length) returns nil, so every code maps to
nil and ANY tgt_lang raises "not valid". The Ruby is a literal
transliteration of transformers.js's `x.slice(2, -2)` (strip the `__`
wrapping); this engine implements that intended semantics.
"""

from __future__ import annotations

import re


class LangSpec:
    """language_regex + code table + lang_to_token, the three attributes
    Utils._build_translation_inputs validates (tokenizers.rb:217-225)."""

    def __init__(self, language_regex, language_codes, lang_to_token):
        self.language_regex = language_regex
        self.language_codes = language_codes
        self.lang_to_token = lang_to_token


def nllb_spec(special_tokens: list[str]) -> LangSpec:
    """NLLB: codes look like 'fra_Latn'; token IS the code
    (tokenizers.rb:181-195)."""
    rx = re.compile(r"^[a-z]{3}_[A-Z][a-z]{3}$")
    return LangSpec(
        language_regex=rx,
        language_codes=[t for t in special_tokens if rx.match(t)],
        lang_to_token=lambda x: x,  # identity
    )


def m2m100_spec(special_tokens: list[str]) -> LangSpec:
    """M2M100: special tokens '__en__'; codes strip the underscores and
    lang_to_token re-wraps (tokenizers.rb:197-211, intended JS-slice
    semantics per the module docstring)."""
    rx = re.compile(r"^__[a-z]{2,3}__$")
    return LangSpec(
        language_regex=rx,
        language_codes=[t[2:-2] for t in special_tokens if rx.match(t)],
        lang_to_token=lambda x: f"__{x}__",
    )


def build_translation_inputs(
    spec: LangSpec,
    generate_kwargs: dict,
    convert_tokens_to_ids,
    *,
    src_lang: str | None = None,
    tgt_lang: str,
) -> dict:
    """Validate the language pair and set forced_bos_token_id
    (Utils._build_translation_inputs, tokenizers.rb:216-244). Error
    strings mirror the reference's. Returns generate_kwargs (mutated)."""
    if not isinstance(spec.language_codes, list):
        raise ValueError(
            "Tokenizer must have `language_codes` attribute set and it "
            "should be an array of language ids."
        )
    if not hasattr(spec.language_regex, "match"):
        raise ValueError(
            "Tokenizer must have `language_regex` attribute set and it "
            "should be a regular expression."
        )
    if not callable(spec.lang_to_token):
        raise ValueError(
            "Tokenizer must have `lang_to_token` attribute set and it "
            "should be a function."
        )
    if tgt_lang not in spec.language_codes:
        raise ValueError(
            f"Target language code {tgt_lang!r} is not valid. Must be one "
            f"of: {', '.join(spec.language_codes)}"
        )
    if src_lang is not None and src_lang not in spec.language_codes:
        raise ValueError(
            f"Source language code {src_lang!r} is not valid. Must be one "
            f"of: {', '.join(spec.language_codes)}"
        )
    generate_kwargs["forced_bos_token_id"] = convert_tokens_to_ids(
        [spec.lang_to_token(tgt_lang)]
    )[0]
    return generate_kwargs
