"""stakgraph_spark — PySpark-native code knowledge-graph construction.

A from-scratch rebuild of stakwork/stakgraph's semantics on Spark: per-file
extraction in Arrow-vectorized pandas UDFs, cross-file resolution as
distributed joins, materialization into partitioned graph tables.
"""

__version__ = "0.1.0"
