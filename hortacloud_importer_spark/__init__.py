"""hortacloud_importer_spark — a PySpark-native analytics engine.

Re-expresses the query / data-processing capabilities of the reference
octree-importer pipeline (see SURVEY.md) as idiomatic Spark DataFrame
operators, plus LLM-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis). Designed for 100 TB scale: every
operator is declarative (Catalyst-optimized), shuffle-aware, and avoids
driver-side materialization.
"""

__version__ = "0.1.0"
