"""Triple extraction over the `files` corpus.

Structural triples — (repo, defines, symbol), (repo, imports, module) —
come from per-language regexp_extract_all: fully vectorized JVM-side
string ops, no model, no Python. Mention triples — (repo, mentions,
entity) — come from the NER pipeline (reference dataflow,
lib/informers/pipelines.rb:88-158) filtered to typed groups.

Scale notes: regexp extraction is embarrassingly parallel over the scan;
the only shuffle is the final distinct, keyed by the triple itself
(uniform). The NER UDF runs on the same scan partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from informers_spark.pipelines.ner import ner

# per-language dialect patterns (Java regex, multiline)
IMPORT_PATTERNS = {
    "python": r"(?m)^import\s+(\w+)",
    "ruby": r"(?m)^require\s+\"([^\"]+)\"",
    "js": r"require\(\"([^\"]+)\"\)",
    "go": r"(?m)^import\s+\"([^\"]+)\"",
    "java": r"(?m)^import\s+([\w.]+);",
}
DEFINE_PATTERNS = {
    "python": r"(?m)^def\s+(\w+)",
    "ruby": r"(?m)^def\s+(\w+)",
    "js": r"function\s+(\w+)",
    "go": r"(?m)^func\s+(\w+)",
    "java": r"(?m)^public\s+\w+\s+(\w+)\(",
}


def _extract_for(df: DataFrame, patterns: dict[str, str], pred: str) -> DataFrame:
    expr = F.array().cast("array<string>")
    for lang, pat in patterns.items():
        expr = F.when(
            F.col("lang") == lang,
            F.regexp_extract_all(F.col("content"), F.lit(pat), F.lit(1)),
        ).otherwise(expr)
    return (
        df.withColumn("obj", F.explode(expr))
        .select(
            F.col("repo").alias("subj"),
            F.lit(pred).alias("pred"),
            F.col("obj"),
            F.lit(1.0).cast("float").alias("score"),
            F.col("content_sha256").alias("src_sha256"),
        )
    )


def extract_structural_triples(files: DataFrame) -> DataFrame:
    """(repo, defines, symbol) ∪ (repo, imports, module)."""
    defines = _extract_for(files, DEFINE_PATTERNS, "defines")
    imports = _extract_for(files, IMPORT_PATTERNS, "imports")
    return defines.unionAll(imports)


def extract_mention_triples(
    files: DataFrame,
    backend: str = "auto",
    groups: tuple[str, ...] = ("PER", "ORG", "LOC"),
) -> DataFrame:
    """(repo, mentions, entity_word) from NER over content, keeping typed
    entity groups only; score is the BIO-group mean score."""
    mentions = ner(
        files.select("repo", "content_sha256", F.col("content").alias("text")),
        text_col="text",
        backend=backend,
    )
    return mentions.filter(F.col("entity_group").isin(*groups)).select(
        F.col("repo").alias("subj"),
        F.lit("mentions").alias("pred"),
        F.col("word").alias("obj"),
        F.col("score"),
        F.col("content_sha256").alias("src_sha256"),
    )


def mentions_table(files: DataFrame, backend: str = "auto") -> DataFrame:
    """The mentions warehouse table (SURVEY.md §1.2):
    (repo, path, commit, content_sha256, entity_group, word, score, start, end)."""
    return ner(
        files.select(
            "repo", "path", "commit", "content_sha256", F.col("content").alias("text")
        ),
        text_col="text",
        backend=backend,
    ).drop("text")
