"""Benchmark harness: times each headline query and prints ONE JSON line.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``. Each query is planned and fully executed
(count-collapsed via a noop write would hide result materialization, so we
use ``collect()`` on the final — small — results, matching how the driver's
correctness gate consumes them).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdatapipelinepysparksqlserver_spark.caching import release_caches  # noqa: E402
from bigdatapipelinepysparksqlserver_spark.queries import REGISTRY  # noqa: E402
from bigdatapipelinepysparksqlserver_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("bench")

    # one warmup pass on the cheapest headline query amortizes JVM/codegen
    # startup out of the per-query numbers
    warm = REGISTRY["mart_client_count"].fn(spark, sf_dir)
    warm.collect()

    # three passes per query, report the min: first execution of a plan pays
    # one-time JVM/codegen compilation that a long-lived cluster amortizes;
    # steady-state is the number that scales, and min-of-3 kills the
    # single-sample scheduling noise that made r2↔r3 per-query deltas
    # unreadable (±15-20% swings on ~1 s queries).
    # Per-query: 2 untimed warm executions, then min of 3 timed runs.
    # The warm runs retire the JVM's one-time compilation of THIS plan
    # (janino whole-stage codegen + C2 JIT — measured ~7 s -> ~3.2 ->
    # ~2.1 -> steady ~1.9 s on the widest plan, dedup_minhash): a
    # long-lived cluster pays that once per plan shape, steady-state is
    # the number that scales. Data caching is NOT warm: clearCache()
    # before every execution (warm and timed) evicts the dedup/LSH
    # operators' persist()ed intermediates, otherwise later runs would
    # time a cache HIT of the first run's blocks rather than the
    # operator — min-of-N must measure real recomputation.
    timings: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        if not spec.headline:
            continue
        for _ in range(2):
            spark.catalog.clearCache()
            spec.fn(spark, sf_dir).collect()
            release_caches()  # drain the scope registry (blocks already evicted)
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            spec.fn(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
            release_caches()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
