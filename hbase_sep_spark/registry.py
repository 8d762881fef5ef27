"""Query registry — the graded surface of SURVEY.md §2.

Every operator registers itself with `@register(name, oracle=...)`.
`name` MUST be a §2 inventory key; `oracle` is the DuckDB-runnable
ANSI SQL the driver compares against (None → rows-only check, used
only for streaming / estimate / cost-bounded ops per §2).

Determinism contract (SURVEY §2): double aggregates rounded on both
sides, computed columns aliased identically on both sides, collected
arrays sorted, every rank/limit tie-broken by a unique key.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]
    section: str


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str] = None, section: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, section=section)
        return fn

    return deco


_LOADED = False


def load_all() -> dict[str, Query]:
    """Import every query module exactly once and return the registry."""
    global _LOADED
    if not _LOADED:
        # Import for registration side effects.
        from hbase_sep_spark import queries  # noqa: F401
        from hbase_sep_spark.streaming import queries as _sq  # noqa: F401

        _LOADED = True
    return REGISTRY
