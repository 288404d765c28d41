"""Graph analytics over relational edge lists.

Connected components live in ``operators/dedup.py`` (min-label
propagation and the O(log n) star-contraction form, built for dup
clustering); this module adds rank propagation — PageRank in FIXED-
POINT INTEGER arithmetic, so every iteration is exact, order-free,
and replayable on any engine.

Why integers: float PageRank sums contributions per node in shuffle
order — nondeterministic low-order bits per run AND per engine, which
breaks the repo's oracle contract. Scaling ranks to BIGINT micro-units
(``scale`` = 10¹²) makes every per-node reduction an integer SUM
(exact, commutative) and every division a floor DIV both engines
share; the floor bias is ≤ outdeg ulps per node per round — at
scale 10¹² that is noise in the 12th decimal, while determinism is
total.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..caching import scoped_persist

PAGERANK_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list (pass both
    directions for an undirected graph). Returns (node, rank) with rank
    in integer ``scale``-units; ranks sum to ~scale.

    r₀ = scale DIV N;
    rᵢ₊₁(v) = (scale·(100−d)) DIV (100·N)
              + (d · Σ_{u→v} rᵢ(u) DIV outdeg(u)) DIV 100

    Every node in the edge list has outdeg ≥ 1 by construction (it
    appears as src of at least one edge when edges are bidirectional);
    dangling mass is therefore zero here — callers with genuinely
    directed graphs should add self-loops for sinks or accept the mass
    leak (documented, not hidden).

    Scale: the edge list joins its node-sized outdegree relation ONCE
    (persisted projected — 24 B/row), then each iteration is one
    node-keyed integer-sum shuffle plus a node-sized rank join; the
    driver loop just composes plans, no data crosses the driver.
    ``iters`` is a fixed small constant by contract (rank deltas decay
    geometrically; 3 rounds is the recommendation-feature regime).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = scoped_persist(e.join(outdeg, "src"))
    nodes = scoped_persist(ed.select(F.col("src").alias("node")).distinct())
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank"))
    base = (scale * (100 - damping_pct)) // (100 * n)
    ranks = nodes.select("node", F.lit(scale // n).cast("long").alias("rank"))
    for _ in range(iters):
        # `div` (not `/`): Spark's `/` on longs is DOUBLE division — a
        # quotient one ulp above an integer truncates UP vs exact
        # integer floor, silently diverging from DuckDB's `//`
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
            ).alias("rank"),
        )
    return ranks
