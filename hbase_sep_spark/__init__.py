"""hbase_sep_spark — PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and
data-processing capabilities surveyed from prazanna/hbase-sep
(an HBase CDC/event-transport library; see SURVEY.md §0-§1) plus the
full relational / semi-structured / streaming / LLM-data-pipeline
surface mandated by the north star (SURVEY.md §2).

Architecture: declarative DataFrame/SQL plans (Catalyst + Tungsten do
the physical planning), Structured Streaming for the CDC/event feed,
Pandas-UDF / applyInPandas only where built-ins can't express the
semantics. Designed for 100 TB scale: no driver-side collects in any
operator path, broadcast only for bounded dims, LSH instead of
all-pairs for near-dup.
"""

__version__ = "0.1.0"
