"""herodb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of vczh/herodb (reference design drafts at
Kernel/Drafts/draft*), re-expressed Spark-first.

The reference's paged-storage / WAL / lock kernel (Kernel/Source/Utility)
maps onto Spark's own storage & execution substrate; this package
implements the *query surface*: typed tables, Datalog-style rule
queries, the aggregation pipeline, graph queries, mutation semantics,
plus large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).
"""

from herodb_spark.session import get_spark
from herodb_spark.catalog import load_tables, TABLE_NAMES

__all__ = ["get_spark", "load_tables", "TABLE_NAMES"]
