"""Text-analysis column expressions (JVM-side, codegen'd — no Python).

All functions return pyspark Column expressions built from built-ins, so
Catalyst keeps them inside WholeStageCodegen. The arithmetic is chosen to
be exactly reproducible in ANSI SQL (DuckDB oracle parity):

- fingerprints use a 31-base polynomial rolling hash mod (2^31 - 1) — no
  64-bit overflow on either engine, sequential fold on both.
- token splitting uses the regex '\\s+' on trimmed text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FP_MOD = 2_147_483_647  # 2^31 - 1

STOPWORDS = [
    "the", "a", "an", "is", "are", "was", "of", "to", "in", "and", "or",
    "by", "for", "with", "on", "at", "it", "this", "that", "be", "as",
]

# tiny per-language stopword lists for the n-gram/lexicon language-ID heuristic
LANG_LEXICON = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed text (empty text → empty array)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda x: x != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def fingerprint(col: Column) -> Column:
    """Rolling polynomial hash of the raw string: fold chars with
    h = (h*31 + ascii(c)) % (2^31-1). Deterministic, SQL-portable.
    Empty split artifacts are filtered on both engines."""
    chars = F.filter(F.split(col, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % F.lit(FP_MOD),
    )


def quality_score(col: Column) -> Column:
    """Heuristic document-quality score in [0,1]:
    mean of (length score, alpha ratio, stopword presence ratio)."""
    toks = tokens(col)
    n = F.size(toks)
    length_score = F.least(n.cast("double") / F.lit(50.0), F.lit(1.0))
    alpha_chars = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    alpha_ratio = F.when(F.length(col) > 0,
                         alpha_chars.cast("double") / F.length(col).cast("double")
                         ).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    stop_ratio = F.when(n > 0, stop_hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    return (length_score + alpha_ratio + F.least(stop_ratio * 4.0, F.lit(1.0))) / 3.0


def repetition_ratio(col: Column, n: int = 2) -> Column:
    """Fraction of duplicated word n-grams in a document — the
    Gopher-style repetition quality rule (a doc whose n-grams repeat
    heavily is boilerplate/spam; pipelines drop rows above a threshold).
    1 - distinct/total over the same word shingles the MinHash path
    uses, so one shingle definition exists repo-wide. Pure column
    expression (codegen'd, map-only — no shuffle, scale-free)."""
    from informers_spark.functions.similarity import word_shingles

    grams = word_shingles(col, n)
    total = F.size(grams)
    return (
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total.cast("double")
    )


def lang_id(col: Column) -> Column:
    """Lexicon-hit language ID: argmax over per-language stopword hit counts,
    ties broken by language code order; no hits → 'und'."""
    toks = tokens(F.lower(col))
    # argmax with left-to-right priority on ties (strict '>' replacement)
    result = F.lit("und")
    best = F.lit(0)
    for code, words in LANG_LEXICON.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        result = F.when(hits > best, F.lit(code)).otherwise(result)
        best = F.when(hits > best, hits).otherwise(best)
    return result


# PII patterns chosen from the dialect intersection of Java regex (Spark)
# and RE2 (DuckDB oracle): character classes, bounded repetition, and \b
# only — no lookaround, no backrefs. Order matters: emails are scrubbed
# before IPs/phones so a dotted domain is never half-eaten by a later rule.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d{1,2}[ \-]\d{3}[ \-]?\d{4}", "[PHONE]"),
)


def pii_count(col: Column, kind: str) -> Column:
    """Occurrence count of one PII pattern ('email' | 'ipv4' | 'phone').
    Counted on the RAW text (before scrubbing). Map-only, codegen'd."""
    pat = {k: p for k, p, _ in PII_PATTERNS}[kind]
    return F.regexp_count(col, F.lit(pat))


def scrub_pii(col: Column) -> Column:
    """Redact emails, IPv4 addresses, and phone numbers to typed tags
    ([EMAIL]/[IP]/[PHONE]) — the training-data PII-scrub rule. A fold of
    JVM regexp_replace calls in PII_PATTERNS order: map-only, no shuffle,
    no Python in the row path; scale cost is O(bytes scanned)."""
    out = col
    for _, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out
