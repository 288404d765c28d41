"""Adversarial retrieval-skew measurement (VERDICT r5 #3): probe a
postings store with a term present in EVERY document and show the
df-threshold guard bounds the probe's cost.

Corpus: ``--docs`` synthetic documents (default 500 k — the sf10
documents scale), each containing the stopword ``the`` (df = 100 %)
plus ~30 tokens drawn deterministically from a 50 k vocabulary; a
``needle`` term appears in 1 % of docs. All generation is Spark
expressions (no driver loops).

Measured, min-of-3 warm:

- build wall for the store,
- probe ["the", "needle"] UNGUARDED (max_df_ratio=None): reads and
  pivots the corpus-sized ``the`` postings list,
- probe ["the", "needle"] GUARDED (max_df_ratio=0.5): termstats
  (vocabulary-bucket-sized) reveals df("the") = N before the postings
  scan, so the pushed ``term IN`` predicate excludes it — the
  corpus-sized postings are never read.

Output: one JSON line for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bigdatapipelinepysparksqlserver_spark.operators.retrieval import (  # noqa: E402
    bm25_from_store,
    build_postings_store,
)
from bigdatapipelinepysparksqlserver_spark.session import get_spark  # noqa: E402


def make_corpus(spark, n_docs: int):
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda j: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id"), j), F.lit(50_000)).cast("string"),
        ),
    )
    text = F.concat_ws(
        " ",
        F.lit("the"),
        F.when(F.col("id") % 100 == 0, F.lit("needle")).otherwise(F.lit("filler")),
        F.array_join(toks, " "),
    )
    return spark.range(n_docs).select(F.col("id").alias("doc_id"), text.alias("text"))


def best_of(fn, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("retrieval-skew-bench")
    store = tempfile.mkdtemp(prefix="retrieval_skew_") + "/store"
    try:
        docs = make_corpus(spark, args.docs)
        t0 = time.time()
        build_postings_store(docs, store)
        build_wall = round(time.time() - t0, 3)

        terms = ["the", "needle"]

        def unguarded():
            bm25_from_store(spark, store, terms, top_n=10).write.format(
                "noop"
            ).mode("overwrite").save()

        def guarded():
            bm25_from_store(
                spark, store, terms, top_n=10, max_df_ratio=0.5
            ).write.format("noop").mode("overwrite").save()

        unguarded()  # warmup
        out = {
            "metric": "retrieval_skew_guard",
            "docs": args.docs,
            "build_s": build_wall,
            "probe_unguarded_s": best_of(unguarded),
            "probe_guarded_s": best_of(guarded),
        }
        out["speedup"] = round(
            out["probe_unguarded_s"] / max(out["probe_guarded_s"], 1e-9), 2
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)


if __name__ == "__main__":
    main()
