"""Adversarial-skew bench for the dedup paths (VERDICT r3 #8).

The mega-bucket guard's SEMANTICS are pytest-proven (capped == uncapped
pair sets); this script measures the WALL-CLOCK claims on adversarial
corpora built from sf0.1 documents:

1. clean      — sf0.1 documents as-is (5k docs), `dedup_minhash`.
2. exact-skew — sf0.1 + N exact copies of one short doc (one mega
   exact-dup cluster).
   a. `dedup_minhash` must COMPLETE with bounded task memory: the
      identical docs share every LSH bucket, so the pair contract forces
      C(N,2) verified pairs — quadratic OUTPUT, guard-bounded MEMORY.
   b. `minhash_near_duplicates_collapsed` must run in ~clean time: the
      cluster collapses to ONE representative before LSH (the production
      answer; asserted ≤ 3x clean).
3. near-skew  — sf0.1 + N near-identical docs (distinct trailing token,
   shared shingles): no exact collapse possible, bucket size N > cap
   4096 → the BIG branch (distributed bucket-keyed self-join) carries
   the expansion. Must complete without OOM; time recorded.

Corpora are materialized to parquet first so every measurement times the
operator over a real scan, not driver-side row generation.

Usage: python tools/skew_bench.py   (prints one JSON line + markdown)
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

from bigdatapipelinepysparksqlserver_spark.operators.dedup import (  # noqa: E402
    minhash_near_duplicates,
    minhash_near_duplicates_collapsed,
)
from bigdatapipelinepysparksqlserver_spark.session import get_spark  # noqa: E402
from bigdatapipelinepysparksqlserver_spark.sources.catalog import (  # noqa: E402
    load_table,
    parallelize_small_scan,
)

N_SKEW = 5000
BOILER = "terms of service apply to all users of this site"  # 9 words → 7 shingles


def _docs(spark, path):
    df = spark.read.parquet(path).select("doc_id", "text")
    return parallelize_small_scan(spark, df, path, "doc_id")


def _time(fn, runs=2):
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        n = fn()
        best = min(best, time.time() - t0)
    return round(best, 2), n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Per-task heap parity with a production executor: local[32] runs 32
    # concurrent tasks inside ONE heap, so the default 8g gives 250 MB a
    # task — a third of what a typical 4-core/4-8 GB executor provides,
    # and the adversarial corpora legitimately need task-normal working
    # memory (the guard bounds PER-TASK memory; it cannot conjure heap
    # the JVM doesn't have). 24g/32 tasks = 750 MB/task.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("skew-bench")
    root = tempfile.mkdtemp(prefix="skew_bench_")
    try:
        base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        max_id = base.agg(F.max("doc_id")).first()[0]
        skew_ids = spark.range(1, N_SKEW + 1).select(
            (F.col("id") + max_id).alias("doc_id")
        )
        exact = base.unionByName(
            skew_ids.withColumn("text", F.lit(BOILER))
        )
        near = base.unionByName(
            skew_ids.withColumn(
                "text", F.concat(F.lit(BOILER + " v"), F.col("doc_id"))
            )
        )
        paths = {}
        for name, df in [("clean", base), ("exact", exact), ("near", near)]:
            p = os.path.join(root, name)
            df.repartition(8).write.parquet(p)
            paths[name] = p

        def run_pairwise(corpus):
            return lambda: minhash_near_duplicates(
                _docs(spark, paths[corpus]), text_col="text", id_col="doc_id",
                threshold=0.2,
            ).count()

        def run_collapsed(corpus):
            return lambda: minhash_near_duplicates_collapsed(
                _docs(spark, paths[corpus]), text_col="text", id_col="doc_id",
                threshold=0.2,
            ).count()

        out = {}
        out["clean_pairwise"] = _time(run_pairwise("clean"))
        out["clean_collapsed"] = _time(run_collapsed("clean"))
        out["exact_pairwise"] = _time(run_pairwise("exact"))
        out["exact_collapsed"] = _time(run_collapsed("exact"))
        out["near_pairwise_bigbranch"] = _time(run_pairwise("near"), runs=1)

        # embedding-side twin: a clone cluster of identical vectors all
        # landing in one hyperplane bucket per table — the big branch of
        # the shared guard carries the forced-quadratic pairs with
        # bounded task memory (the vector payloads rejoin only at the
        # cosine verify, per the r4 id-only re-shape)
        from bigdatapipelinepysparksqlserver_spark.operators.similarity import (
            embedding_near_duplicates,
        )

        base_emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        clone = [float((i * 37 % 101) / 101.0 - 0.5) for i in range(64)]
        max_vid = base_emb.agg(F.max("vec_id")).first()[0]
        emb_skew = base_emb.unionByName(
            spark.range(1, 2001)
            .select((F.col("id") + max_vid).alias("vec_id"))
            .withColumn(
                "embedding",
                F.expr(
                    "transform(sequence(1, 64), j -> CAST("
                    + "element_at(array("
                    + ", ".join(str(x) for x in clone)
                    + "), j) AS FLOAT))"
                ),
            )
        )
        p = os.path.join(root, "emb_skew")
        emb_skew.repartition(8).write.parquet(p)

        def run_emb():
            df = spark.read.parquet(p)
            return embedding_near_duplicates(
                df, id_col="vec_id", vec_col="embedding", dim=64,
                threshold=0.4, bits=4, tables=4,
            ).count()

        out["emb_clone_cluster"] = _time(run_emb, runs=1)

        ratio = out["exact_collapsed"][0] / max(out["clean_collapsed"][0], 1e-9)
        print(json.dumps({
            "metric": "skew_bench",
            "sf_dir": sf_dir,
            "n_skew": N_SKEW,
            "results": {k: {"sec": v[0], "pairs": v[1]} for k, v in out.items()},
            "exact_collapsed_over_clean": round(ratio, 2),
            "collapsed_within_3x_clean": ratio <= 3.0,
        }))
        print()
        print("| corpus / operator | sec | verified pairs |")
        print("|---|---|---|")
        for k, (s, n) in out.items():
            print(f"| {k} | {s} | {n} |")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
