"""Scoped lifecycle for operator-internal ``persist()`` calls.

Several dedup/LSH operators persist an intermediate because the
returned LAZY plan consumes it from more than one branch (and the
subtree contains higher-order-function lambdas, which defeat exchange
reuse — recomputing it would double the operator's cost). The operator
cannot eagerly unpersist (that would evict the cache before the caller
materializes the plan), so r2–r4 left the block's lifetime to Spark's
ContextCleaner — correct for one-shot runs, but a long-lived session
invoking many dedup operators accumulates cached partitions until GC
notices, and re-invoking the same operator re-persists a
structurally-identical plan ("Asked to cache already cached data"
warnings in full-sweep checker logs).

This module is the explicit owner (r4 verdict item 3): operators route
their persists through :func:`scoped_persist`, and the harness —
anything that materializes a query and is done with it: the bench loop,
the correctness checker, a pipeline step — calls
:func:`release_caches` afterwards. Unpersisting is idempotent and lazy
blocks that never materialized are a no-op, so over-releasing is always
safe; the one rule is not to release BETWEEN building a plan and
collecting it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCOPED: list[DataFrame] = []


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` registered for the next :func:`release_caches`."""
    df = df.persist()
    _SCOPED.append(df)
    return df


def release_caches() -> int:
    """Unpersist every scope-registered cache; returns how many.

    Call after materializing the consuming query (collect/write). Safe
    to call any number of times, including with zero registered caches
    or after ``spark.catalog.clearCache()`` already evicted the blocks.
    """
    n = 0
    while _SCOPED:
        df = _SCOPED.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
        n += 1
    return n
