"""Graded query implementations, one module per SURVEY.md §2 block.

Importing this package registers every batch query into
`hbase_sep_spark.registry.REGISTRY`.
"""

from hbase_sep_spark.queries import (  # noqa: F401
    aggregates,
    events,
    filters,
    joins,
    llm_extras,
    llm_ops,
    relational_ext,
    scalars,
    semistructured,
    sets,
    sort_limit,
    sources_formats,
    udfs,
    windows,
)
