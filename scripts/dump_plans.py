#!/usr/bin/env python3
"""Dump .explain("formatted") for named catalog queries to files.

Usage: python scripts/dump_plans.py OUTDIR SUFFIX [query ...]
With no query names, dumps every headline query. Reads the fixture dir
from $SPARK_GRAFT_SF_DIR (default sf0.1) — planning only, nothing runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from monitoring_data_ingestion_spark.plans import REGISTRY
    from monitoring_data_ingestion_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="mdi-plan-dump",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not names:
        names = sorted(n for n, s in REGISTRY.items() if s.headline)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
