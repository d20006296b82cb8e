#!/usr/bin/env python
"""Capture .explain('formatted') of each query's FINAL DataFrame.

Monkeypatches DataFrame.localCheckpoint so the plan of the last
checkpointed frame (the returned one) is recorded; for queries that
never checkpoint, the returned DataFrame's plan is captured directly.

Usage: capture_plans.py OUTDIR SUFFIX query [query ...]
Writes OUTDIR/<query>_<SUFFIX>.txt
"""
import os
import sys

REPO = os.environ.get("PLAN_REPO", "/root/repo")
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame  # noqa: E402

from dp_dimension_importer_spark.registry import QUERIES  # noqa: E402
from dp_dimension_importer_spark.session import get_spark  # noqa: E402

_last_plan = {"txt": None}
_orig_lcp = DataFrame.localCheckpoint


def _patched_lcp(self, eager=True):
    try:
        _last_plan["txt"] = self._jdf.queryExecution().explainString(
            self._sc._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
    except Exception as e:  # plan capture must never break the query
        _last_plan["txt"] = f"<explain failed: {e}>"
    return _orig_lcp(self, eager)


DataFrame.localCheckpoint = _patched_lcp


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="plancap")
    for name in names:
        _last_plan["txt"] = None
        df = QUERIES[name](spark, sf_dir)
        txt = _last_plan["txt"]
        if txt is None:
            txt = df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"captured {name} ({len(txt)} bytes)", flush=True)


if __name__ == "__main__":
    main()
