"""Dump `.explain("formatted")` for named registered queries into
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence trail
(judge checks plan claims against these files).

Usage: python tools/explain_dump.py <tag> <suffix> [sf_dir] [query ...]

With no query names, dumps every HEADLINE query. ``tag`` is the round
directory (e.g. ``r12``); ``suffix`` is usually ``before`` or ``after``;
files land in plans/<tag>/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdatapipelinepysparksqlserver_spark.caching import release_caches  # noqa: E402
from bigdatapipelinepysparksqlserver_spark.queries import REGISTRY  # noqa: E402
from bigdatapipelinepysparksqlserver_spark.session import get_spark  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:] or [n for n, s in REGISTRY.items() if s.headline]
    out_dir = os.path.join(REPO_ROOT, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump")
    for name in names:
        spec = REGISTRY[name]
        df = spec.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        release_caches()
        spark.catalog.clearCache()
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
