"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship flow-telemetry query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full named catalog from
:mod:`picoprobedataflow_spark.plans` (one entry per implemented
operator row of SURVEY.md §2, plus the training-data pipeline ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from picoprobedataflow_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn = plans.all_queries()["flow_step_runtime_summary"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return plans.all_oracle_sql()
