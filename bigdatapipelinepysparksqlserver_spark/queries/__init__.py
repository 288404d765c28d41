"""Query registry: every implemented operator exposed as a named
(Spark callable, DuckDB oracle SQL) pair — the generalization of the
reference's two-engine reconciliation (`load_sales_history.py:189-252`) to
the entire operator surface.

Import side effect: importing this package registers all queries.
"""

from .registry import REGISTRY, QuerySpec, query  # noqa: F401
from . import relational_queries  # noqa: F401,E402
from . import tpch_extra  # noqa: F401,E402
from . import temporal_queries  # noqa: F401,E402
from . import window_queries  # noqa: F401,E402
from . import dedup_queries  # noqa: F401,E402
from . import text_queries  # noqa: F401,E402
from . import training_queries  # noqa: F401,E402
from . import similarity_queries  # noqa: F401,E402
from . import multimodal_queries  # noqa: F401,E402
from . import pipeline_queries  # noqa: F401,E402


def spark_queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_queries():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def headline_queries():
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.headline}
