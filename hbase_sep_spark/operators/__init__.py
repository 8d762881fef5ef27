"""Reusable DataFrame→DataFrame operator library for the
LLM-data-pipeline surface (SURVEY §2.11 + north-star training-data
ops): vector similarity, dedup (exact / MinHash-LSH / SimHash /
Jaccard), and text analysis. All operators are declarative Spark
expressions (JVM-side, no Python row loops) unless noted.
"""

from hbase_sep_spark.operators import dedup, text, vectors  # noqa: F401
