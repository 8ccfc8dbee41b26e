"""metar_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the full query/data-processing surface of the reference
METAR ELT pipeline (NikitaDeulin01/metar-pipeline, studied read-only at
/root/reference) as an idiomatic Spark DataFrame/SQL/Structured-Streaming
engine, and extends it with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).

Design rules (see SURVEY.md):
- DataFrame-first: every operator is a declarative logical plan; Catalyst
  handles pushdown/pruning/join planning. No RDDs, no driver-side loops.
- JVM-side expressions (pyspark.sql.functions) in all hot paths; Arrow
  Pandas UDFs only where built-ins cannot express the semantics.
- Scale-aware: broadcast small dims, partial aggregation everywhere,
  partition-pruning-friendly layouts, AQE on by default.
"""

from metar_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
