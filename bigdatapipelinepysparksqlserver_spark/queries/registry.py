"""Registry plumbing for named queries with DuckDB oracles."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB over the same parquet views; None = rows-only check
    headline: bool = False  # include in bench.py timing loop


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Decorator registering a (spark_fn, oracle_sql) pair.

    Column-name contract: every computed/aggregate column is aliased to the
    SAME name in the Spark plan and the oracle SQL — the driver's comparator
    sorts columns by name before value-hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        assert name not in REGISTRY, f"duplicate query name: {name}"
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco
