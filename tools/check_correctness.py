"""Local mirror of the driver's correctness gate.

Runs every registered query at sf0.01 on Spark AND its DuckDB oracle,
comparing row count, column names, and an order-insensitive value hash.

Two comparison modes:

* **canon** (default) — mirrors the DRIVER's pandas-based comparator:
  Spark `.toPandas()` vs DuckDB `.sql(...).df()`, columns sorted by
  name, `DataFrame.sort_values` over all columns, every cell
  stringified. This surfaces *type-representation* mismatches the
  exact mode can't see: Spark DECIMAL(38,2) arrives as
  `Decimal('3916451.10')` (object dtype) while DuckDB's `.df()`
  downcasts the same value to `float64 3916451.1`; DuckDB HUGEINT
  (`SUM(CASE ...)`) becomes `float64 1791.0` vs Spark's long `1791`.
  String-equal only by luck — which is exactly the r2 driver fail
  mechanism (15 hash-fails, all bit-identical at full precision).
* **--exact** — the old full-precision compare (`collect()` vs
  `fetchall()`, Decimal-aware) for diagnosing whether a canon fail is
  representation-only or a real value error.

Usage: python tools/check_correctness.py [--exact] [--window N] [sf_dir] [query ...]

  --window N  check only the first N registry entries (the driver
              grades exactly the first 50).
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatapipelinepysparksqlserver_spark.caching import release_caches  # noqa: E402
from bigdatapipelinepysparksqlserver_spark.queries import REGISTRY  # noqa: E402
from bigdatapipelinepysparksqlserver_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


# ---------------------------------------------------------------- exact mode
def norm_val(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm_val(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


# ---------------------------------------------------------------- canon mode
def canon_cell(v) -> str:
    """Driver-like stringification: floats lightly rounded, everything
    else via str() — so Decimal('3916451.10') vs float64 3916451.1
    deliberately DIFFER, as they do in the driver's comparator."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(round(v, 9))
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass  # arrays etc.
    return str(v)


def canon_lines(pdf: pd.DataFrame) -> list[str]:
    """The driver's canon: columns sorted by name, rows via
    DataFrame.sort_values over ALL columns (this is what raises
    `unhashable type: numpy.ndarray` on array columns — reproduce it),
    then stringified."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return ["\x01".join(canon_cell(v) for v in row)
            for row in pdf.itertuples(index=False, name=None)]


def canon_hash(pdf: pd.DataFrame) -> str:
    # sort the stringified lines too: sort_values on mixed object dtypes
    # can order differently across engines for equal multisets
    lines = sorted(canon_lines(pdf))
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:]]
    exact = "--exact" in args
    if exact:
        args.remove("--exact")
    window = None
    if "--window" in args:
        i = args.index("--window")
        window = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("correctness-check")
    failures = []
    for pos, (name, spec) in enumerate(REGISTRY.items()):
        if window is not None and pos >= window:
            break
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            if exact:
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
            else:
                spdf = sdf.toPandas()
                scols = list(spdf.columns)
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        finally:
            # scoped operator persists (dedup/LSH) are done once the
            # result is materialized — keep the sweep's memory flat
            release_caches()
        if spec.oracle is None:
            n = len(srows) if exact else len(spdf)
            print(f"rows  {name}: {n} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(spec.oracle)
            if exact:
                ocols = res.columns
                orows = res.fetchall()
            else:
                opdf = res.df()
                ocols = list(opdf.columns)
        except Exception:
            print(f"FAIL  {name}: oracle error\n{traceback.format_exc()}")
            failures.append(name)
            continue

        problems = []
        if exact:
            if len(srows) != len(orows):
                problems.append(f"rows {len(srows)} vs {len(orows)}")
            if sorted(scols) != sorted(ocols):
                problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
            if not problems and value_hash(scols, srows) != value_hash(ocols, orows):
                problems.append("hash")
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("\x01".join(norm_val(r[i]) for i in order_s) for r in srows)
                lo = sorted("\x01".join(norm_val(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        print(f"      spark : {a[:200]}")
                        print(f"      oracle: {b[:200]}")
                        break
            nrows = len(srows)
        else:
            if len(spdf) != len(opdf):
                problems.append(f"rows {len(spdf)} vs {len(opdf)}")
            if sorted(scols) != sorted(ocols):
                problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
            if not problems:
                try:
                    sh, oh = canon_hash(spdf), canon_hash(opdf)
                except Exception:
                    problems.append("canon crash")
                    print(traceback.format_exc(limit=3))
                    sh = oh = None
                if sh is not None and sh != oh:
                    problems.append("canon hash")
                    for a, b in zip(sorted(canon_lines(spdf)), sorted(canon_lines(opdf))):
                        if a != b:
                            print(f"      spark : {a[:200]}")
                            print(f"      oracle: {b[:200]}")
                            break
            nrows = len(spdf)

        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            failures.append(name)
        else:
            print(f"ok    {name}: {nrows} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
