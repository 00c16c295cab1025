"""Capture .explain("formatted") for named registry queries into a dir.

Usage: python tools/capture_plans.py OUTDIR SUFFIX q1 q2 ...
Writes OUTDIR/<query>_<SUFFIX>.txt. For queries whose fn() runs eager
actions (iterative BSP, GD fits), the captured plan is the RETURNED
frame's plan; the iterative internals are documented by the job counts in
OPTIMIZATION_r13.md (tools/profile_query.py) — noted in a header line.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    from canvas_data_aws_spark.plans.registry import all_queries
    from canvas_data_aws_spark.session import get_spark

    spark = get_spark(app_name="cda-capture-plans")
    registry = all_queries()
    for name in names:
        df = registry[name].fn(spark, "/root/testdata/sf0.1")
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, flush=True)
        spark.catalog.clearCache()
        try:
            for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                jrdd.unpersist(False)
        except Exception:
            pass
    spark.stop()


if __name__ == "__main__":
    main()
