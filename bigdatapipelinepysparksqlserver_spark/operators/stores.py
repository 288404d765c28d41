"""Batched-store compaction — the store analogue of the lake's
small-file `compact_partitions` hook (sources/lake.py).

The two growing stores (`postings_store_append_batch` in
operators/retrieval.py and `ivf_store_append_batch` in
operators/similarity.py) trade write amplification for append cheapness:
every daily batch adds a `batch=N` partition level, so after a year the
probe side lists 365 × the directories and opens 365 × the files for the
same logical rows — partition pruning still bounds WHAT is read, but the
file-listing overhead and per-file open cost grow with batch count, not
data. Compaction merges the batch levels back down on an explicit
maintenance schedule (weekly, or when batch count crosses a threshold),
exactly like the reference's full-reload path resets its incremental
state (reference README.md:62 — the rebuild is the compaction of last
resort; this one costs one shuffle instead of a re-tokenization).

Correctness contract (pytest-asserted, tests/test_store_compaction.py):
probe(compacted) ≡ probe(batched) ≡ probe(rebuild) — guaranteed because
the append contract already requires disjoint per-batch doc-ids, so
merging is pure recomposition of exact integers:

- postings rows: each (term, doc) lives in exactly one batch → union;
- doclens: disjoint ids → union;
- stats: one row = Σ per-batch (n_docs, total_dl) — the same sums the
  probe computes across batches at read time, precomputed;
- termstats: df per (bucket, term) = Σ per-batch dfs — ditto;
- IVF rows: each vector lives in exactly one batch → union (the cell
  assignment is a pure function of the shared codebook, unchanged).

Scale: compaction is one partition-discovery read + one partitioned
write per relation — postings re-shuffle on ``bucket`` (so each bucket
directory collapses to ~one file, restoring the term-sorted row-group
pruning the per-batch writes had within themselves but not across), the
rest are scan-and-rewrite. No driver-side rows.

The swap is directory-level: relations write to ``{path}.__compact__``,
then the store directory is swapped via the FS seam's ``rename_dir``.
Probes running CONCURRENTLY with the swap are out of contract (the
store is a maintenance-window artifact, unlike the versioned mart
publish which holds readers' snapshots immutable); production layouts
needing live compaction should version the store path and flip a
pointer, i.e. compose this with sources/fs.py's publish pattern.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..sources.fs import LocalFS, SnapshotFS

_POSTINGS_RELS = ("postings", "doclens", "stats", "termstats")


def _is_batched(fs: SnapshotFS, path: str) -> bool:
    return fs.is_dir(path) and any(
        name.startswith("batch=") for name in fs.list_dir(path)
    )


def compact_store_batches(
    spark,
    path: str,
    fs: SnapshotFS | None = None,
) -> dict:
    """Merge a batched store's ``batch=N`` levels back to the FLAT
    layout its ``build_*`` writer produces. Detects the store kind from
    the layout: a ``postings/`` subdirectory means a postings store
    (four relations recomposed), otherwise ``batch=N`` directories at
    the top level mean an IVF vector store (one relation).

    A flat (never-appended) store is a no-op — returns
    ``{"kind": ..., "compacted": False}``. After compaction the store
    is FLAT: a later ``*_append_batch`` must start a fresh batched
    store seeded from it (mixing flat files with ``batch=`` directories
    under one parquet root breaks partition discovery — the same
    either/or the append docstrings already contract).

    Returns ``{"kind", "compacted", "batches"}`` for observability.
    """
    fs = fs or LocalFS()
    if fs.is_dir(f"{path}/postings"):
        kind = "postings"
        batched = _is_batched(fs, f"{path}/postings")
        batches = (
            sorted(
                n for n in fs.list_dir(f"{path}/postings")
                if n.startswith("batch=")
            )
            if batched
            else []
        )
    elif fs.is_dir(path):
        kind = "ivf"
        batched = _is_batched(fs, path)
        batches = (
            sorted(n for n in fs.list_dir(path) if n.startswith("batch="))
            if batched
            else []
        )
    else:
        raise ValueError(f"compact_store_batches: no store at {path}")
    if not batched:
        return {"kind": kind, "compacted": False, "batches": []}

    tmp = f"{path}.__compact__"
    if fs.is_dir(tmp):
        fs.rmtree(tmp)
    if kind == "postings":
        _compact_postings(spark, path, tmp)
    else:
        _compact_ivf(spark, path, tmp)
    # directory-level swap: the half-written staging dir never aliases
    # the live store, and a crash before the final rename leaves the
    # original store intact (re-run compaction to finish)
    old = f"{path}.__old__"
    if fs.is_dir(old):
        fs.rmtree(old)
    fs.rename_dir(path, old)
    fs.rename_dir(tmp, path)
    fs.rmtree(old)
    return {"kind": kind, "compacted": True, "batches": batches}


def _compact_postings(spark, path: str, tmp: str) -> None:
    """Recompose the four postings-store relations flat (see module
    docstring for why each recomposition is exact)."""
    postings = spark.read.parquet(f"{path}/postings").drop("batch")
    # one shuffle keyed by the bucket partition column: each bucket
    # directory collapses to ~one file, and the within-file term sort is
    # restored ACROSS the merged batches (row-group min/max pruning on
    # ``term`` sees one sorted run, not N interleaved ones)
    (
        postings.repartition(F.col("bucket"))
        .sortWithinPartitions("bucket", "term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{tmp}/postings")
    )
    spark.read.parquet(f"{path}/doclens").drop("batch").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/doclens")
    # stats: Σ per-batch exact integers → the single row build_ writes
    (
        spark.read.parquet(f"{path}/stats")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("total_dl").cast("long").alias("total_dl"),
        )
        .write.mode("overwrite")
        .parquet(f"{tmp}/stats")
    )
    (
        spark.read.parquet(f"{path}/termstats")
        .groupBy("bucket", "term")
        .agg(F.sum("df").cast("long").alias("df"))
        .select("term", "df", "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{tmp}/termstats")
    )


def _compact_ivf(spark, path: str, tmp: str) -> None:
    """Flatten ``batch=N/cell=C`` to ``cell=C`` — cell assignments are a
    pure function of the shared codebook, so rows just re-home."""
    (
        spark.read.parquet(path)
        .drop("batch")
        .repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(tmp)
    )
