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

# Floor-relative grading (VERDICT r8 #8): the shared box carries
# ambient load from OUTSIDE the container that swings same-tree totals
# ±20-40% between rounds, making absolute per-round deltas unreadable.
# Each headliner's FLOOR is its best recorded per-query wall across all
# BENCH_r*.json history at sf0.1 (min-of-N on an idle box, identical or
# slower plans) — a run's vs_floor ratio therefore separates "the box
# is loaded" (every ratio inflates together; see loadavg) from "this
# query regressed" (one ratio inflates alone, persistently).
FLOORS_S = {
    "ann_topk_cosine": 0.517,  # r10
    "asof_attribution": 0.451,  # r10
    "bm25_store_probe": 2.909,  # r10
    "decontaminate": 0.512,  # r9
    "doc_winnow_span_scrub_apply": 4.175,  # r11 (new headliner)
    "decontaminate_spans": 1.229,  # r11
    "dedup_exact": 0.139,  # r11
    "dedup_minhash": 1.306,  # r10
    "mart_client_count": 0.529,    # r11
    "mart_sales_agg": 0.781,  # r10
    "part_copurchase_pagerank": 3.554,  # r11
    "semantic_dedup": 4.024,  # r9
    "sessionize": 0.917,  # r11
    "text_quality_score": 0.397,  # r11
    "text_repetition_score": 0.567,  # r11
    "tpch_q1": 0.693,              # r4
    "tpch_q18": 0.552,  # r11
    "tpch_q3": 0.592,  # r11
    "tpch_q5": 0.572,  # r9
}


def _loadavg() -> list[float]:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except OSError:
        return []


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
    load_before = _loadavg()
    timings: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        if not spec.headline:
            continue
        for _ in range(2):
            spark.catalog.clearCache()
            spec.fn(spark, sf_dir).collect()
            release_caches()  # drain the scope registry (blocks already evicted)
        # min-of-5 (was 3): the box's ambient-load spikes outlast a
        # 3-sample window on ~1 s queries; two more samples per query
        # measurably tightens the floor estimate at trivial cost
        best = float("inf")
        for _ in range(5):
            spark.catalog.clearCache()
            t0 = time.time()
            spec.fn(spark, sf_dir).collect()
            best = min(best, time.time() - t0)
            release_caches()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    vs_floor = {
        n: round(t / FLOORS_S[n], 3) for n, t in timings.items() if n in FLOORS_S
    }
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "floors": {n: FLOORS_S[n] for n in timings if n in FLOORS_S},
                "vs_floor": vs_floor,
                "loadavg_before": load_before,
                "loadavg_after": _loadavg(),
                "runs_per_query": 5,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
