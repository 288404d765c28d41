"""Deterministic scale-up of driver testdata for scale rehearsals.

The driver ships sf{0.001,0.01,0.1}; validating the engine's SCALE design
needs at least one 10x data point (VERDICT r3 #1). This tool expands a base
sf dir by an integer factor k with replica-consistent key offsets, producing
data whose *workload shape* scales linearly — the property the rehearsal is
measuring:

- **Star-schema keys scale with consistent FKs.** Replica ``i`` shifts every
  PK by ``i * (max_pk + 1)`` and every FK by the SAME stride computed from
  the referenced table, so join fan-outs, per-key group sizes and key-space
  density are preserved exactly while distinct-key counts grow k-fold.
  region/nation stay fixed (fixed-size dims in TPC-H proper too).
- **Documents: disjoint shingle spaces per replica.** Replica ``i>0``
  suffixes every whitespace token with ``~i``: the within-replica duplicate/
  near-duplicate structure is preserved verbatim (dedup output scales
  exactly k-fold) while NO shingle is shared across replicas — replicating
  text unchanged would instead give every doc k-1 spurious near-dups and a
  quadratic pair blow-up that says nothing about real scaling.
- **Embeddings: deterministic per-replica perturbation.** Replica ``i>0``
  adds a fixed sinusoid (function of vec_id, dim index, replica) so
  within-replica cosine structure survives (ANN/near-dup answer sets scale
  ~k-fold) without manufacturing k-sized clusters of identical vectors.
- **Timestamps/temporal density.** Event/order dates are kept, so time
  windows see k x the rows — the realistic way a corpus grows at fixed
  retention.

Everything is computed by Spark expressions over one scan per table (the
replica axis is an ``explode(sequence(...))``), so the tool itself follows
the engine's rules: no driver-side row loops, no Python UDFs.

Usage:
    python tools/make_scaled_sf.py [--base /root/testdata/sf0.1] \
        [--out /root/repo/.scaled/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bigdatapipelinepysparksqlserver_spark.session import get_spark  # noqa: E402
from bigdatapipelinepysparksqlserver_spark.sources.catalog import (  # noqa: E402
    TABLE_NAMES,
    load_table,
)

# (table, pk column) pairs whose stride is computed from the PK table and
# reused for every FK reference, keeping referential integrity per replica.
PK_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# shifted columns per table: column -> stride source table
SHIFTS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

# output file counts sized so the scaled scan splits into real tasks
OUT_FILES = {"lineitem": 16, "orders": 8, "events": 8}


def scale_dir(
    base: str, out: str, factor: int, only: "list[str] | None" = None
) -> None:
    """``only``: restrict scaling to these tables (e.g. just
    ``documents`` for a deep ≥300× retrieval/dedup point, where scaling
    the full star schema would cost disk for tables the measured
    queries never read). Strides still come from the referenced PK
    tables, so FK consistency is preserved for whatever IS scaled."""
    sel = list(TABLE_NAMES if only is None else only)
    unknown = [t for t in sel if t not in TABLE_NAMES]
    if unknown:
        raise ValueError(f"unknown tables: {unknown}")
    spark = get_spark("make-scaled-sf")
    need = set(sel) | {
        src for t in sel for src in SHIFTS.get(t, {}).values()
    }
    tables = {t: load_table(spark, base, t) for t in need}
    # control-plane scalars: one tiny agg per PK table
    stride = {
        t: tables[t].agg(F.max(pk)).first()[0] + 1
        for t, pk in PK_OF.items()
        if t in need
    }
    os.makedirs(out, exist_ok=True)
    rep = F.explode(F.expr(f"sequence(0, {factor - 1})")).alias("rep")

    for t in sel:
        df = tables[t]
        if t in ("region", "nation"):
            out_df = df
        else:
            df = df.select("*", rep)
            cols = []
            for f in tables[t].schema.fields:
                c = F.col(f.name)
                src = SHIFTS.get(t, {}).get(f.name)
                if src is not None:
                    c = (c + F.col("rep") * F.lit(stride[src])).cast(f.dataType)
                elif t == "documents" and f.name == "text":
                    c = F.when(F.col("rep") == 0, c).otherwise(
                        F.concat_ws(
                            " ",
                            F.expr(
                                "transform(split(text, ' '),"
                                " w -> concat(w, '~', rep))"
                            ),
                        )
                    )
                elif t == "documents" and f.name == "n_chars":
                    # recompute: the token suffixes change the length
                    c = None
                elif t == "embeddings" and f.name == "embedding":
                    c = F.expr(
                        "transform(embedding, (x, j) -> CAST(x + CASE"
                        " WHEN rep = 0 THEN CAST(0.0 AS DOUBLE)"
                        " ELSE 0.08 * sin((vec_id % 997) * 1.7"
                        "      + j * 0.63 + rep * 2.19) END AS FLOAT))"
                    )
                if c is not None:
                    cols.append(c.alias(f.name))
            out_df = df.select(*cols)
            if t == "documents":
                out_df = out_df.withColumn(
                    "n_chars", F.length("text").cast("bigint")
                ).select(*[f.name for f in tables[t].schema.fields])
            n_out = OUT_FILES.get(t, max(2, factor // 2))
            out_df = out_df.repartition(n_out)
        out_df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
        print(f"{t}: wrote x{factor if t not in ('region', 'nation') else 1}")
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scaled/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--tables", default=None,
        help="comma-separated subset to scale (default: all tables)",
    )
    args = ap.parse_args()
    scale_dir(
        args.base, args.out, args.factor,
        only=args.tables.split(",") if args.tables else None,
    )


if __name__ == "__main__":
    main()
