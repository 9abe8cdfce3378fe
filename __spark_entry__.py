"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship KG-style query over the sf0.001 driver tables:
               keyword-mention triples ∪ same_as triples from connected
               components over LSH-bucketed embeddings.
queries()    — one callable per implemented operator (SURVEY.md §2 +
               training-data ops); implemented in informers_spark.queries.
oracle_sql() — DuckDB-equivalent SQL per query (same constants inlined);
               NER has an exact SQL oracle; md5-seeded inference outputs
               (embed / QA / fill-mask / generate / vision / audio) are
               pinned by frozen parquet fixtures wired into oracle_sql()
               (queries.FIXTURE_QUERIES). Every query has an oracle (84
               queries as of r5, all value-verified at sf0.01 and — for
               the 63 SQL-oracle ones — at sf0.1):
               q_approx_distinct pins the HLL accuracy invariant (approx
               within 5% of DuckDB's exact count) and q_minhash_pairs_fast
               reuses the portable twin's SQL (the exact-Jaccard verify is
               hash-invariant; see its docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from informers_spark.queries import q_cc_components, q_kw_mentions

    sf_dir = "/root/testdata/sf0.001"
    mentions = q_kw_mentions(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("subj"), F.col("pred"), F.col("obj")
    )
    same_as = q_cc_components(spark, sf_dir).select(
        F.col("node").cast("string").alias("subj"),
        F.lit("same_as").alias("pred"),
        F.col("component").cast("string").alias("obj"),
    )
    return mentions.unionAll(same_as)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from informers_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from informers_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
