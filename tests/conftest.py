from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dp_dimension_importer_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # r15 (suite wall time, VERDICT r14 item 1): createDataFrame local
    # relations parallelize over spark.default.parallelism slices (= all 32
    # cores unset), and every coalesce(1) fixture write then drains each
    # slice through its own sequential ~130 ms Python-worker round-trip —
    # ~4.3 s per tiny fixture action, dozens of sites across the suite.
    # Four slices keep the same semantics at ~0.5 s. Test-session tuning
    # only; bench/driver sessions are untouched.
    s = get_spark(
        app_name="tests",
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    return con
