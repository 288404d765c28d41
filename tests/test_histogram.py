"""fixed_width_histogram: exact bins, clamping, empty-bin emission."""

import pytest

from bigdatapipelinepysparksqlserver_spark.operators.relational import (
    fixed_width_histogram,
)


def test_histogram_hand_computed(spark):
    # lo=0 hi=40 bins=4 → width 10; values chosen to hit bins 0,1,3,
    # leave bin 2 empty, and clamp -5 (→bin 0) and 99/40 (→bin 3)
    df = spark.createDataFrame(
        [(v,) for v in [-5, 0, 9, 10, 39, 40, 99]], "x long"
    )
    rows = fixed_width_histogram(df, "x", lo=0, hi=40, bins=4).collect()
    assert [r.bin_id for r in rows] != []  # materialized
    got = {r.bin_id: (r.bin_lo, r.bin_hi, r.cnt) for r in rows}
    assert len(rows) == 4  # empty bins emitted
    assert got[0] == (0, 10, 3)  # -5 clamped, 0, 9
    assert got[1] == (10, 20, 1)  # 10
    assert got[2] == (20, 30, 0)  # empty
    assert got[3] == (30, 40, 3)  # 39, 40 clamped, 99 clamped


def test_histogram_empty_input_is_all_zero_bins(spark):
    df = spark.createDataFrame([], "x long")
    rows = fixed_width_histogram(df, "x", lo=0, hi=100, bins=5).collect()
    assert len(rows) == 5
    assert all(r.cnt == 0 for r in rows)
    assert [r.bin_id for r in sorted(rows, key=lambda r: r.bin_id)] == list(
        range(5)
    )


@pytest.mark.parametrize(
    "lo,hi,bins",
    [(0, 100, 0), (100, 100, 4), (0, 10, 3), (10, 0, 2)],
)
def test_histogram_rejects_bad_params(spark, lo, hi, bins):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        fixed_width_histogram(df, "x", lo=lo, hi=hi, bins=bins)
