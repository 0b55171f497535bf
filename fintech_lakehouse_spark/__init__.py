"""fintech_lakehouse_spark — a PySpark-native analytics engine.

Re-implements (Spark-first, from public knowledge only) the query and
data-processing surface of the reference fintech lakehouse
(``raghavathyagaraj/fintech-lakehouse``): medallion-layer ingestion,
typed Bronze→Silver casting, data-quality checking with quarantine
split, dedup / surrogate keys, Delta-style upsert + maintenance,
monitoring queries, plus batch & streaming analytics over events and
large-scale training-data ops (dedup, similarity search, text
analysis) over documents/embeddings.

Design stance (SURVEY.md §7): declarative DataFrame/SQL plans so
Catalyst handles pushdown/pruning/join selection; no RDDs; no
row-at-a-time Python UDFs in hot paths — built-in functions first,
Arrow-vectorized pandas UDFs only where semantics demand.
"""

from fintech_lakehouse_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
