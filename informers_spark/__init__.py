"""informers_spark — a PySpark-native analytics / KG-construction engine.

Re-creates the query and data-processing capabilities of the reference
(ankane/informers: transformer pipelines — NER, embeddings, classification,
zero-shot, reranking) as idiomatic Spark DataFrame transforms, and extends
them with the relational / dedup / similarity / text-analysis operators a
large-scale training-data pipeline needs.

Design stance (SURVEY.md §7.0): DataFrame-first, Catalyst-optimized, all
heavy compute in Arrow-batched pandas UDFs (never per-row Python), explicit
partitioning/skew handling for 100 TB scale.
"""

__version__ = "0.1.0"

from informers_spark.session import get_spark  # noqa: F401
