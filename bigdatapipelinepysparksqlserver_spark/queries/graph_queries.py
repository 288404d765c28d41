"""Graph-analytics queries: rank propagation over relational edge
lists. Connected-components queries live with the dedup family
(`dedup_clusters`, `emb_neardup_clusters*`); this module adds the
iterative-rank shape — PageRank in fixed-point integer arithmetic, so
a 3-round iterative algorithm is exactly DuckDB-replayable (the
kmeans_refine trick taken further: not a 6-dp handoff but EXACT
integers end to end)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.graph import PAGERANK_SCALE, pagerank
from ..sources.catalog import Catalog
from .registry import query

PR_ITERS = 3
_S = PAGERANK_SCALE


def _pr_iteration_sql(i: int) -> str:
    prev = f"r{i - 1}"
    return f"""
c{i} AS (
  SELECT e.dst AS node, SUM(r.rank // o.odeg) AS s
  FROM e0 e
  JOIN {prev} r ON r.node = e.src
  JOIN outdeg o ON o.src = e.src
  GROUP BY e.dst
),
r{i} AS (
  SELECT n.node,
         CAST(({_S} * 15) // (100 * (SELECT n FROM params)) AS BIGINT)
         + CAST((85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank
  FROM nodes n LEFT JOIN c{i} c USING (node)
)"""


PAGERANK_ORACLE = f"""
WITH e0 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey <> b.l_partkey
),
outdeg AS (SELECT src, COUNT(*) AS odeg FROM e0 GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM e0),
params AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (
  SELECT node, CAST({_S} // (SELECT n FROM params) AS BIGINT) AS rank
  FROM nodes
),{",".join(_pr_iteration_sql(i) for i in range(1, PR_ITERS + 1))}
SELECT node AS part_id, rank FROM r{PR_ITERS}
"""


@query("part_copurchase_pagerank", oracle=PAGERANK_ORACLE)
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part co-purchase graph (parts are neighbors
    iff they share an order) — the iterative graph-algorithm shape as
    a graded query, in FIXED-POINT INTEGER arithmetic: ranks live in
    10¹²-units, every reduction is an exact integer SUM, every division
    an integer DIV both engines share (Spark `div` ≡ DuckDB `//` on
    the all-positive values here; Spark's `/` would route through
    double division and truncate UP on one-ulp-high quotients). Three
    rounds unrolled in the oracle as chained CTEs.

    Scale: edges join their node-sized outdegree once (persisted
    projected); each round is one node-keyed integer-sum shuffle +
    a node-sized rank join — the driver loop composes plans, no data
    crosses the driver. Per-order edge fanout is order-size-bounded
    (TPC-H ≤ 7 items).
    """
    li = Catalog(spark, sf_dir).lineitem.select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    return pagerank(edges, iters=PR_ITERS).select(
        F.col("node").alias("part_id"), "rank"
    )
