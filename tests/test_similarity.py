"""Similarity operators: exact vs approximate consistency."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bigdatapipelinepysparksqlserver_spark.operators.similarity import (
    brute_force_topk,
    ivf_codebook_topk,
    ivf_topk,
    lsh_topk,
)
from bigdatapipelinepysparksqlserver_spark.sources.catalog import Catalog

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return Catalog(spark, SF).embeddings


def test_brute_force_topk_properties(spark, emb):
    q = emb.where(F.col("vec_id") < 4)
    out = brute_force_topk(emb, q, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for qid, rows in by_q.items():
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
        cosines = [r.cosine for r in sorted(rows, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)  # ranked by similarity
        assert all(r.neighbor_id != qid for r in rows)   # no self-match


def test_approximate_results_are_subset_quality(spark, emb):
    """Every approximate hit must carry the TRUE cosine (exact re-rank),
    so approx results are always a subset of the exact score space."""
    q = emb.where(F.col("vec_id") < 4)
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in brute_force_topk(emb, q, k=500).collect()
    }
    codebook = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid")
    )
    for approx_df in (
        lsh_topk(emb, q, dim=64, k=5, bits=4),
        ivf_topk(emb, q, n_centroids=8, n_probe=3, k=5),
        ivf_codebook_topk(emb, q, codebook, n_probe=3, k=5),
    ):
        for r in approx_df.collect():
            assert exact[(r.query_id, r.neighbor_id)] == r.cosine


def test_ivf_deterministic(spark, emb):
    q = emb.where(F.col("vec_id") < 3)
    a = sorted(map(str, ivf_topk(emb, q, n_centroids=8, n_probe=2, k=5).collect()))
    b = sorted(map(str, ivf_topk(emb, q, n_centroids=8, n_probe=2, k=5).collect()))
    assert a == b


def test_multi_table_lsh_recall_floor(spark, emb):
    """Amplification regression guard: 4-table LSH must beat the
    single-table recall collapse (0.125 @ bits=4) by a wide margin.
    Floor set below the measured 0.39 to absorb data drift, high enough
    to catch a plane/table regression."""
    q = emb.where(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, q, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(emb, q, dim=64, k=10, bits=4, tables=4).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.25, f"multi-table LSH recall collapsed: {recall:.3f}"


def test_ivf_partitioned_store_prunes_and_matches(spark, emb, tmp_path):
    """The cell-partitioned vector store must (a) return EXACTLY the
    projection-assignment search's results (the driver-side probe twin
    folds doubles in the same order as the scan-side SQL), and (b) scan
    ONLY the probed cells' partition directories (PartitionFilters)."""
    from bigdatapipelinepysparksqlserver_spark.operators.similarity import (
        ivf_codebook_topk,
        ivf_partitioned_topk,
        write_ivf_partitioned,
    )

    codebook = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("centroid")
    )
    q = emb.where(F.col("vec_id") < 8)
    store = str(tmp_path / "ivf_store")
    write_ivf_partitioned(emb, codebook, store)

    got = ivf_partitioned_topk(
        spark, store, q, codebook, n_probe=4, k=10
    )
    want = ivf_codebook_topk(emb, q, codebook, n_probe=4, k=10)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:200]
    # pruning is real: the store fanned out into more cell dirs than the
    # probe set can touch, so the IN-filter excludes actual directories
    import os

    n_cells_on_disk = len([d for d in os.listdir(store) if d.startswith("cell=")])
    assert n_cells_on_disk > 4


def test_recommended_bits_policy():
    """bits↔N sizing policy regression anchor (BASELINE.md, sf1
    rehearsal): 20 k vectors → 8 bits, the measured sweet spot (45.6 s
    at 4 bits vs 5.4 s at 8, 99.6 % pair retention). Monotone in N,
    clamped at both ends, and invariant to proportional scaling of
    (N, target_bucket)."""
    import pytest as _pytest

    from bigdatapipelinepysparksqlserver_spark.operators.similarity import (
        recommended_bits,
    )

    assert recommended_bits(20_000) == 8          # the measured anchor
    assert recommended_bits(80) == 4              # floor clamp (N == bucket)
    assert recommended_bits(10) == 4
    assert recommended_bits(10**12) == 24         # ceiling clamp
    # monotone nondecreasing in N
    prev = 0
    for n in (100, 1_000, 10_000, 100_000, 10**6, 10**9):
        b = recommended_bits(n)
        assert b >= prev
        prev = b
    # 10× corpus with 10× target bucket keeps bits (occupancy-invariant)
    assert recommended_bits(200_000, target_bucket=800) == recommended_bits(20_000)
    with _pytest.raises(ValueError):
        recommended_bits(0)
    with _pytest.raises(ValueError):
        recommended_bits(100, target_bucket=0)


def test_recommended_cells_policy():
    """IVF cell-count sizing: ~sqrt(N) rounded to a power of two,
    clamped — with the sf1 measurement as the regime anchor (see
    BASELINE.md r5 IVF-store note)."""
    import pytest as _pytest

    from bigdatapipelinepysparksqlserver_spark.operators.similarity import (
        recommended_cells,
    )

    assert recommended_cells(20_000) == 128          # sqrt(20000)=141 -> 128
    assert recommended_cells(100) == 16              # floor clamp
    assert recommended_cells(10**9) == 32_768        # sqrt(1e9)=31623 -> 32768
    assert recommended_cells(10**12) == 1 << 18      # ceiling clamp
    prev = 0
    for n in (1_000, 10_000, 10**6, 10**8, 10**10):
        c = recommended_cells(n)
        assert c >= prev and (c & (c - 1)) == 0      # monotone, power of two
        prev = c
    with _pytest.raises(ValueError):
        recommended_cells(0)
