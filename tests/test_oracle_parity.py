"""The t2 gate, locally: every oracled query must match DuckDB exactly.

Runs at sf0.001 by default (fast inner loop); set
``SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01`` to mirror the driver's gate.
"""

from __future__ import annotations

import pytest

from dp_dimension_importer_spark import registry
from tests.compare import assert_frames_match
from tests.conftest import SF_ORACLE

ORACLED = sorted(registry.ORACLE_SQL)
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLE_SQL))


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, duck, name):
    sdf = registry.QUERIES[name](spark, SF_ORACLE).toPandas()
    ddf = duck.execute(registry.ORACLE_SQL[name]).fetchdf()
    assert_frames_match(sdf, ddf, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    """Rows-only operators (LSH/ANN) must at least execute with a stable
    schema; their quality is gated by dedicated recall tests."""
    df = registry.QUERIES[name](spark, SF_ORACLE)
    assert df.columns
    df.limit(5).collect()
