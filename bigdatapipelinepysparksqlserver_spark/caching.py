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
the correctness checker, a pipeline step, a foreachBatch sink — calls
:func:`release_caches` afterwards. Unpersisting is idempotent and lazy
blocks that never materialized are a no-op, so over-releasing is always
safe; the one rule is not to release BETWEEN building a plan and
collecting it.

The registry is THREAD-LOCAL: a streaming micro-batch sink (which runs
on the stream-execution thread and releases its own registrations at
the end of each batch) cannot have its not-yet-materialized caches
evicted by a concurrent ``release_caches()`` on the main thread, and
vice versa — each thread owns exactly the caches it registered, which
is what makes the "materialize, then release" rule locally enforceable.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_TLS = threading.local()


def _scoped() -> "list[DataFrame]":
    lst = getattr(_TLS, "scoped", None)
    if lst is None:
        lst = _TLS.scoped = []
    return lst


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` registered for this THREAD's next
    :func:`release_caches`."""
    df = df.persist()
    _scoped().append(df)
    return df


def release_caches() -> int:
    """Unpersist every cache THIS thread registered; returns how many.

    Call after materializing the consuming query (collect/write). Safe
    to call any number of times, including with zero registered caches
    or after ``spark.catalog.clearCache()`` already evicted the blocks.
    Other threads' registrations are untouched.
    """
    lst = _scoped()
    n = 0
    while lst:
        df = lst.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
        n += 1
    return n
