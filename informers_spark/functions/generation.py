"""Greedy-generation kernels: sampler + logits processors with
reference-parity semantics (reference: lib/informers/utils/generation.rb).

v1 scope is greedy search (num_beams=1, do_sample=false) — the decode
loop lives in pipelines/generate.py inside a mapInPandas UDF, advancing
every row of an Arrow batch together (one batched backend forward per
step, the distributed analog of the reference's batched beam loop,
models.rb:214-349). Beam/multinomial samplers stay out of v1 (§7.6).

Processors are pure (ids, logits) -> logits functions over numpy rows,
unit-tested against hand values in tests/test_generation.py.
"""

from __future__ import annotations

import numpy as np


def greedy_sample(logits: np.ndarray) -> int:
    """Argmax next token; first index wins ties like Utils.max
    (reference: lib/informers/utils/generation.rb:119-131, math.rb:110-115)."""
    return int(np.argmax(logits))


def apply_temperature(logits: np.ndarray, temperature: float) -> np.ndarray:
    """Sampler#get_logits temperature divide
    (reference: lib/informers/utils/generation.rb:96-101)."""
    if temperature and temperature > 0:
        return logits / temperature
    return logits


def beam_sample(
    logits: np.ndarray, num_beams: int, top_k: int = 50
) -> list[tuple[int, float]]:
    """BeamSearchSampler step: top-k logits → softmax → num_beams
    (token, log p) candidates (reference: lib/informers/utils/
    generation.rb:133-156). get_top_items' stable desc order applies —
    ties resolve to the lower token id. NOTE: the reference's own
    get_sampler can also route to MultinomialSampler, a class it never
    defines (NameError upstream) — not reproduced here."""
    k = logits.shape[-1]
    if top_k and top_k > 0:
        k = min(top_k, k)
    order = np.argsort(-logits, kind="stable")[:k]
    top_logits = logits[order]
    m = top_logits.max()
    e = np.exp(top_logits - m)
    probs = e / e.sum()
    # clamp to the available support (top_k may be narrower than num_beams)
    return [
        (int(order[i]), float(np.log(probs[i])))
        for i in range(min(num_beams, k))
    ]


class NoRepeatNGramLogitsProcessor:
    """Ban any token that would complete an n-gram already present in the
    generated ids (reference: lib/informers/utils/generation.rb:191-248).
    No bans until at least n tokens would exist after this step."""

    def __init__(self, no_repeat_ngram_size: int):
        self.n = no_repeat_ngram_size

    def _banned(self, ids: list[int]) -> list[int]:
        n = self.n
        if len(ids) + 1 < n:
            return []
        # map each (n-1)-prefix seen in ids to its continuations
        seen: dict[tuple, list[int]] = {}
        for j in range(len(ids) + 1 - n):
            key = tuple(ids[j : j + n - 1])
            seen.setdefault(key, []).append(ids[j + n - 1])
        return seen.get(tuple(ids[len(ids) + 1 - n :]), [])

    def __call__(self, ids: list[int], logits: np.ndarray) -> np.ndarray:
        for t in self._banned(ids):
            logits[t] = -np.inf
        return logits


class MinLengthLogitsProcessor:
    """-inf the EOS logit(s) until the sequence reaches min_length
    (reference: lib/informers/utils/generation.rb:250-266)."""

    def __init__(self, min_length: int, eos_token_id: int | list[int]):
        self.min_length = min_length
        self.eos = eos_token_id if isinstance(eos_token_id, list) else [eos_token_id]

    def __call__(self, ids: list[int], logits: np.ndarray) -> np.ndarray:
        if len(ids) < self.min_length:
            for e in self.eos:
                logits[e] = -np.inf
        return logits


class ForcedBOSTokenLogitsProcessor:
    """Force the first generated token to bos_token_id
    (reference: lib/informers/utils/generation.rb:268-280); the ids list
    starts with the decoder start token, so len==1 means 'first step'."""

    def __init__(self, bos_token_id: int):
        self.bos = bos_token_id

    def __call__(self, ids: list[int], logits: np.ndarray) -> np.ndarray:
        if len(ids) == 1:
            logits[:] = -np.inf
            logits[self.bos] = 0.0
        return logits


class ForcedEOSTokenLogitsProcessor:
    """Parity stub: the reference's #call body is EMPTY (returns nil —
    lib/informers/utils/generation.rb:282-292), so this is a documented
    no-op, kept so generation configs that set forced_eos_token_id wire
    up the same object graph."""

    def __init__(self, max_length: int, forced_eos_token_id: int):
        self.max_length = max_length
        self.eos = forced_eos_token_id

    def __call__(self, ids: list[int], logits: np.ndarray) -> np.ndarray:
        return logits


# GenerationConfig defaults the greedy/beam paths consult (subset of the
# reference's ~40 keys, lib/informers/utils/generation.rb:3-73; keys the
# v1 decode loop does not read are omitted rather than silently ignored)
GENERATION_DEFAULTS = {
    "max_length": 20,
    "max_new_tokens": None,
    "min_length": 0,
    "num_beams": 1,
    "temperature": 1.0,
    "top_k": 50,
    "do_sample": False,
    "no_repeat_ngram_size": 0,
    "forced_bos_token_id": None,
    "forced_eos_token_id": None,
    "num_return_sequences": 1,
}


def build_processors(
    eos_token_id: int,
    min_length: int = 0,
    no_repeat_ngram_size: int = 0,
    forced_bos_token_id: int | None = None,
) -> list:
    """Processor list in the reference's wiring order
    (reference: lib/informers/models.rb:353-408)."""
    procs: list = []
    if no_repeat_ngram_size and no_repeat_ngram_size > 0:
        procs.append(NoRepeatNGramLogitsProcessor(no_repeat_ngram_size))
    if forced_bos_token_id is not None:
        procs.append(ForcedBOSTokenLogitsProcessor(forced_bos_token_id))
    if min_length and min_length > 0:
        procs.append(MinLengthLogitsProcessor(min_length, eos_token_id))
    return procs
