"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's query registry
(``canvas_data_aws_spark.plans.registry``): every operator from SURVEY.md §2
registers there as a named query with a Spark implementation and (where
SQL-expressible) a DuckDB oracle string. See the registry module docstring
for the determinism rules (column aliasing, float rounding, BIGINT casts).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives beside this file; make imports CWD-independent
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from canvas_data_aws_spark.plans.relational import flagship_pricing_summary

    return flagship_pricing_summary(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from canvas_data_aws_spark.plans.registry import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; non-SQL-expressible ops are
    omitted (driver records a rows-only check for those)."""
    from canvas_data_aws_spark.plans.registry import oracle_map

    return oracle_map()
