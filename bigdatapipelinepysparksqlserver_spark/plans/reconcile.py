"""Two-sided reconciliation comparator (C6, `load_sales_history.py:189-252`).

The de-facto end-to-end test of every load: COUNT(id) and SUM(paid) over
the changed partitions computed INDEPENDENTLY on the source and on the
lake, compared for strict equality. Decimal sums make the comparison
exact and order-independent (double sums are neither — SURVEY §7.5
risk 1).

Empty change-set short-circuits to SUCCESSFUL (load_sales_history.py:
205-207).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.relational import reconcile_aggs

SUCCESSFUL = "SUCCESSFUL"
FAILED = "FAILED"


@dataclass
class ReconcileResult:
    status: str
    source_count: int
    source_sum: object
    lake_count: int
    lake_sum: object


def reconcile(
    source_sales: DataFrame,
    lake_df: DataFrame,
    partitions: list[int],
    current_cutoff: datetime,
) -> ReconcileResult:
    """Compare source vs lake COUNT/SUM over ``partitions``.

    Source side mirrors the T-SQL half (load_sales_history.py:213-218):
    year_month IN (...) AND sale_date < cutoff; lake side the SparkSQL
    half (:225-232). Both aggregates are single-row — collect is free.
    """
    if not partitions:
        return ReconcileResult(SUCCESSFUL, 0, 0, 0, 0)

    src = source_sales.where(
        F.col("year_month").isin(partitions)
        & (F.col("sale_date") < F.lit(current_cutoff))
    )
    lk = lake_df.where(F.col("year_month").isin(partitions))

    s = reconcile_aggs(src, "id", "paid").first()
    l = reconcile_aggs(lk, "id", "paid").first()  # noqa: E741

    ok = s.sale_count == l.sale_count and s.paid_sum == l.paid_sum
    return ReconcileResult(
        SUCCESSFUL if ok else FAILED,
        s.sale_count, s.paid_sum, l.sale_count, l.paid_sum,
    )
