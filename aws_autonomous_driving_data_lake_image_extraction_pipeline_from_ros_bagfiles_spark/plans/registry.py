"""Registry mapping query name -> (Spark builder, DuckDB oracle SQL).

Each builder has signature ``(spark, sf_dir) -> DataFrame``. The oracle is
ANSI SQL DuckDB runs against views named after the parquet tables; ``None``
marks a genuinely non-SQL-expressible operator (the driver then records a
weaker rows-only check).

Column-name contract: every computed column is aliased identically on both
sides — the driver sorts columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optionally its oracle) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
