"""kuibadb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of KuiBaDB (reference @ /root/reference), plus
the large-scale training-data-pipeline operator surface (dedup, similarity
search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7.0): a thin, semantics-bearing layer over Spark
SQL/Catalyst. Logical plans are declared with the DataFrame/SQL API; the
physical strategy (pushdown, pruning, broadcast-vs-shuffle, AQE re-planning,
whole-stage codegen) is Catalyst's job. No collect()-loops in operator
paths — every operator is expressed in scale-out-safe form.
"""

from kuibadb_spark.session import get_spark
from kuibadb_spark.catalog import load, register_views, TABLES

__all__ = ["get_spark", "load", "register_views", "TABLES"]
