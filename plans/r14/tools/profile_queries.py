#!/usr/bin/env python
"""Profile queries: wall time + Spark job count per run (median of N)."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from dp_dimension_importer_spark.registry import QUERIES  # noqa: E402
from dp_dimension_importer_spark.session import get_spark  # noqa: E402


def jobs(sc):
    n = sc._jsc.sc().dagScheduler().nextJobId()
    return n if isinstance(n, int) else n.get()


def main():
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROF_RUNS", "3"))
    spark = get_spark(app_name="profile")
    sc = spark.sparkContext
    QUERIES["q13_groupby_agg"](spark, sf_dir).count()
    QUERIES["q44_pandas_udf"](spark, sf_dir).count()
    out = {}
    for name in names:
        QUERIES[name](spark, sf_dir).count()  # warm
        sc._jvm.System.gc()
        samples = []
        jdeltas = []
        for _ in range(runs):
            j0 = jobs(sc)
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            samples.append(round(time.perf_counter() - t0, 3))
            jdeltas.append(jobs(sc) - j0)
        med = sorted(samples)[len(samples) // 2]
        out[name] = {"sec": med, "all": samples, "jobs": jdeltas[-1]}
        print(json.dumps({name: out[name]}), flush=True)
    print("SUMMARY " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
