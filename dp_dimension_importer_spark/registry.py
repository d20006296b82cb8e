"""Single source of truth: query name -> (PySpark callable, DuckDB oracle).

The driver contract (``__spark_entry__.py``) reads ``QUERIES`` and
``ORACLE_SQL`` from here. Operator modules register into their own local
dicts; this module merges them and guarantees name uniqueness.
"""

from __future__ import annotations

from dp_dimension_importer_spark.operators import (
    aggregates,
    arrays_json,
    joins,
    scans_filters,
    setops,
    windows,
)
from dp_dimension_importer_spark.operators.common import QueryFn

_MODULES = [
    scans_filters,
    joins,
    aggregates,
    windows,
    setops,
    arrays_json,
]

# Optional modules (added incrementally; keep imports explicit and fail loud
# once present).
from dp_dimension_importer_spark.operators import analytics  # noqa: E402
from dp_dimension_importer_spark.operators import dedup  # noqa: E402
from dp_dimension_importer_spark.operators import similarity  # noqa: E402
from dp_dimension_importer_spark.operators import text  # noqa: E402
from dp_dimension_importer_spark.operators import udfs  # noqa: E402
from dp_dimension_importer_spark.operators import multimodal  # noqa: E402
from dp_dimension_importer_spark.operators import streaming_windows  # noqa: E402

_MODULES += [text, udfs, dedup, similarity, multimodal, streaming_windows, analytics]


def _merge() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query {name!r} ({mod.__name__})")
            queries[name] = fn
        oracle.update(mod.ORACLE)
    return queries, oracle


QUERIES, ORACLE_SQL = _merge()
