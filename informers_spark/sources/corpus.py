"""Deterministic synthetic source-code corpus (the north-rule `files` table).

Schema per BASELINE.json input_hint:
    files(repo string, path string, commit string, lang string, content string)

Everything is generated DISTRIBUTED with pure Spark SQL expressions off
spark.range(n) — no driver-side data, no Python in the loop — so the same
generator runs at sf0.001 in tests and at 10^12 rows on a cluster. All
choices are deterministic functions of (id, seed) via xxhash64, so the
expected triples are computable exactly by `expected_triples()` from the
same formulas (the P/R oracle).

Skew: a configurable fraction of rows lands in repo 0 ("hot repo") to
exercise salting / AQE skew-join handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MODULES = ["json", "httpx", "mathkit", "zlibx", "csvkit", "rekit", "sqlgen", "logfmt", "netio", "yamlx"]
SYMBOLS = ["parse", "render", "fetch_rows", "train", "merge", "split_rows", "encode", "decode", "flush", "init_db"]
PEOPLE = ["Matz", "Guido", "Linus", "Grace", "Ada"]
# org surface forms include near-duplicate variants (shared-token multi-word
# names) so the entity-linking stage has real same_as edges to find
ORGS = ["Apache Spark", "Apache Spark Framework", "Google", "Github",
        "Ruby Core Team", "Ruby Core", "Mozilla"]
LOCS = ["London", "Tokyo", "Paris", "Berlin", "Kyoto"]
# surface-variant pairs the linker is expected to connect (cosine of
# mean-pooled token embeddings ≥ ~0.8 because they share 2/3+ tokens)
EXPECTED_SAME_AS = [
    ("Apache Spark", "Apache Spark Framework"),
    ("Ruby Core", "Ruby Core Team"),
]
LANGS = ["python", "ruby", "js", "go", "java"]
EXT = {"python": "py", "ruby": "rb", "js": "js", "go": "go", "java": "java"}


def _pick(options: list[str], col):
    """options[pmod(col, len)] as a chained when-expression (JVM-side)."""
    idx = F.pmod(col, F.lit(len(options)))
    expr = F.lit(options[0])
    for i in range(len(options) - 1, 0, -1):
        expr = F.when(idx == i, F.lit(options[i])).otherwise(expr)
    return expr


def _fields(seed: int):
    """Deterministic per-row attribute columns shared by generator and oracle."""
    h = lambda salt: F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt))
    hot = F.pmod(h("hot"), F.lit(10)) < 3  # ~30% of rows → repo 0
    repo_idx = F.when(hot, F.lit(0)).otherwise(F.pmod(h("repo"), F.lit(97)))
    # symbol names carry a numeric suffix so the distinct-triple count
    # scales with the corpus instead of saturating a tiny vocabulary
    sym = lambda salt: F.concat(
        _pick(SYMBOLS, h(salt)), F.lit("_"), F.pmod(h(salt + "n"), F.lit(500)).cast("string")
    )
    return {
        "repo": F.concat(F.lit("org"), F.pmod(repo_idx, F.lit(13)).cast("string"),
                         F.lit("/repo"), repo_idx.cast("string")),
        "lang": _pick(LANGS, h("lang")),
        "mod1": _pick(MODULES, h("mod1")),
        "mod2": _pick(MODULES, h("mod2") + 1),
        "sym1": sym("sym1"),
        "sym2": sym("sym2"),
        "person": _pick(PEOPLE, h("person")),
        "org": _pick(ORGS, h("org")),
        "loc": _pick(LOCS, h("loc")),
    }


def _content(f: dict):
    nl = F.lit("\n")
    comment = F.concat(
        F.lit("Created by "), f["person"], F.lit(" at "), f["org"],
        F.lit(" in "), f["loc"], F.lit("."),
    )

    def py():
        return F.concat(
            F.lit("import "), f["mod1"], nl, F.lit("import "), f["mod2"], nl, nl,
            F.lit("# "), comment, nl,
            F.lit("def "), f["sym1"], F.lit("():\n    return 1\n\n"),
            F.lit("def "), f["sym2"], F.lit("():\n    return 2\n"),
        )

    def rb():
        return F.concat(
            F.lit('require "'), f["mod1"], F.lit('"\nrequire "'), f["mod2"], F.lit('"\n\n'),
            F.lit("# "), comment, nl,
            F.lit("def "), f["sym1"], F.lit("\n  1\nend\n\n"),
            F.lit("def "), f["sym2"], F.lit("\n  2\nend\n"),
        )

    def js():
        return F.concat(
            F.lit('const a = require("'), f["mod1"], F.lit('");\nconst b = require("'),
            f["mod2"], F.lit('");\n\n'),
            F.lit("// "), comment, nl,
            F.lit("function "), f["sym1"], F.lit("() { return 1; }\n"),
            F.lit("function "), f["sym2"], F.lit("() { return 2; }\n"),
        )

    def go():
        return F.concat(
            F.lit('import "'), f["mod1"], F.lit('"\nimport "'), f["mod2"], F.lit('"\n\n'),
            F.lit("// "), comment, nl,
            F.lit("func "), f["sym1"], F.lit("() int { return 1 }\n"),
            F.lit("func "), f["sym2"], F.lit("() int { return 2 }\n"),
        )

    def java():
        return F.concat(
            F.lit("import "), f["mod1"], F.lit(";\nimport "), f["mod2"], F.lit(";\n\n"),
            F.lit("// "), comment, nl,
            F.lit("public int "), f["sym1"], F.lit("() { return 1; }\n"),
            F.lit("public int "), f["sym2"], F.lit("() { return 2; }\n"),
        )

    return (
        F.when(f["lang"] == "python", py())
        .when(f["lang"] == "ruby", rb())
        .when(f["lang"] == "js", js())
        .when(f["lang"] == "go", go())
        .otherwise(java())
    )


def generate_files(
    spark: SparkSession, n: int = 1000, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """files(repo, path, commit, lang, content, content_sha256, file_id)."""
    df = spark.range(0, n, numPartitions=partitions or min(max(n // 1000, 4), 256))
    f = _fields(seed)
    df = (
        df.withColumn("repo", f["repo"])
        .withColumn("lang", f["lang"])
        .withColumn("content", _content(f))
    )
    ext_expr = F.lit(EXT[LANGS[0]])
    for l in LANGS[1:]:
        ext_expr = F.when(F.col("lang") == l, F.lit(EXT[l])).otherwise(ext_expr)
    df = df.withColumn(
        "path",
        F.concat(
            F.lit("src/"),
            _pick(["core", "io", "util", "api"], F.xxhash64("id", F.lit(seed), F.lit("dir"))),
            F.lit("/f"), F.col("id").cast("string"), F.lit("."), ext_expr,
        ),
    )
    df = (
        df.withColumn("commit", F.substring(F.sha2(F.concat(F.col("repo"), F.lit("@"), F.lit(seed)), 256), 1, 40))
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
        .withColumnRenamed("id", "file_id")
    )
    return df.select("file_id", "repo", "path", "commit", "lang", "content", "content_sha256")


def expected_triples(spark: SparkSession, n: int = 1000, seed: int = 42) -> DataFrame:
    """Golden (subj, pred, obj) set computed from the SAME deterministic
    formulas the generator used — the P/R≥0.95 oracle (BASELINE.md)."""
    df = spark.range(0, n)
    f = _fields(seed)
    base = df.select(
        F.col("id").alias("file_id"),
        f["repo"].alias("repo"),
        f["mod1"].alias("mod1"), f["mod2"].alias("mod2"),
        f["sym1"].alias("sym1"), f["sym2"].alias("sym2"),
        f["person"].alias("person"), f["org"].alias("org"), f["loc"].alias("loc"),
    )
    parts = []
    for c in ("sym1", "sym2"):
        parts.append(base.select(F.col("repo").alias("subj"), F.lit("defines").alias("pred"), F.col(c).alias("obj")))
    for c in ("mod1", "mod2"):
        parts.append(base.select(F.col("repo").alias("subj"), F.lit("imports").alias("pred"), F.col(c).alias("obj")))
    for c in ("person", "org", "loc"):
        parts.append(base.select(F.col("repo").alias("subj"), F.lit("mentions").alias("pred"), F.col(c).alias("obj")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.distinct()
