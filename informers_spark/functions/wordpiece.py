"""WordPiece-lite: a vocab-driven offline subword tokenizer so the
sandbox fallback reproduces the reference's subword semantics — greedy
longest-match, '##' continuation pieces, per-SUBWORD truncation at
max_tokens, char offsets per piece — without the Rust `tokenizers` wheel
(reference: lib/informers/tokenizers.rb:65-119; HF WordPiece algorithm).

Used by HashBackend when constructed with a vocab; the BIO grouping in
the NER pipeline then merges '##' pieces back with join_wordpiece
(kernels.py), mirroring convert_tokens_to_string
(reference: lib/informers/tokenizers.rb:125-127).
"""

from __future__ import annotations

import re

_WORD_RE = re.compile(r"\w+|[^\w\s]")


class WordPieceTokenizer:
    def __init__(
        self,
        vocab: list[str] | dict[str, int],
        unk_token: str = "[UNK]",
        lowercase: bool = True,
        max_subwords_per_word: int = 100,
    ):
        self.vocab = set(vocab) if not isinstance(vocab, dict) else set(vocab)
        self.unk_token = unk_token
        self.lowercase = lowercase
        self.max_subwords_per_word = max_subwords_per_word

    def _split_word(self, word: str) -> list[tuple[str, int, int]] | None:
        """Greedy longest-match split of one word → [(piece, rel_s, rel_e)]
        with '##' continuations; None when any position has no match
        (→ whole word becomes UNK, the HF WordPiece rule)."""
        # Lowercase PER CANDIDATE SLICE, not the whole word up front:
        # Unicode case folding can change string length ('İ' → 'i̇'), and
        # offsets must index the ORIGINAL word (callers map them onto the
        # source text). Slicing the original keeps offsets exact; only
        # the vocab lookup sees the lowered form.
        w = word
        pieces: list[tuple[str, int, int]] = []
        pos = 0
        while pos < len(w):
            if len(pieces) >= self.max_subwords_per_word:
                return None
            end = len(w)
            found = None
            while end > pos:
                sub = w[pos:end].lower() if self.lowercase else w[pos:end]
                cand = ("##" + sub) if pos > 0 else sub
                if cand in self.vocab:
                    found = (cand, pos, end)
                    break
                end -= 1
            if found is None:
                return None
            pieces.append(found)
            pos = found[2]
        return pieces

    def tokenize_with_offsets(
        self, text: str, max_tokens: int = 512
    ) -> list[tuple[str, int, int]]:
        """→ [(subword, start, end)] over the original text, truncated at
        max_tokens SUBWORDS (the reference truncates at the subword level,
        tokenizers.rb:98-101 — word-level fallbacks over-pack long docs)."""
        out: list[tuple[str, int, int]] = []
        for m in _WORD_RE.finditer(text):
            word, ws = m.group(0), m.start()
            pieces = self._split_word(word)
            if pieces is None:
                out.append((self.unk_token, ws, m.end()))
            else:
                out.extend((p, ws + s, ws + e) for p, s, e in pieces)
            if len(out) >= max_tokens:
                return out[:max_tokens]
        return out


def pad_batch(
    ids_batch: list[list[int]],
    pad_id: int = 0,
    padding_side: str = "right",
) -> tuple[list[list[int]], list[list[int]]]:
    """Pad a batch of id sequences to the max length, returning
    (input_ids, attention_mask). padding_side='left' pads at the FRONT —
    the decoder-only generation convention the reference enables via
    `tokenizer.padding_side = \"left\"` (tokenizers.rb:141-143, set by
    the text-generation pipeline at pipelines.rb:388) so the last
    position of every row is a real token and one batched forward reads
    next-token logits at index -1 for all rows."""
    if padding_side not in ("left", "right"):
        raise ValueError(f"padding_side must be 'left' or 'right', got {padding_side!r}")
    n = max((len(x) for x in ids_batch), default=0)
    ids_out, mask_out = [], []
    for row in ids_batch:
        pad = [pad_id] * (n - len(row))
        ones = [1] * len(row)
        zeros = [0] * (n - len(row))
        if padding_side == "left":
            ids_out.append(pad + list(row))
            mask_out.append(zeros + ones)
        else:
            ids_out.append(list(row) + pad)
            mask_out.append(ones + zeros)
    return ids_out, mask_out


def default_vocab() -> list[str]:
    """A small deterministic vocab for offline tests: whole common words
    plus 2-char pieces, so real splits happen ('github' → gi ##th ##ub
    unless 'github' itself is present)."""
    import string

    pieces = [a + b for a in string.ascii_lowercase for b in string.ascii_lowercase]
    return (
        list(string.ascii_lowercase)
        + pieces
        + ["##" + p for p in pieces]
        + ["##" + c for c in string.ascii_lowercase]
    )
