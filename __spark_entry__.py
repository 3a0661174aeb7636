"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship north-star query (PIP join + per-polygon counts)
                on /root/testdata/sf0.001.
queries()     — every implemented operator from SURVEY.md §2, one callable
                (spark, sf_dir) -> DataFrame each.
oracle_sql()  — matching DuckDB-runnable ANSI SQL producing identical rows
                (see whitebox_geospatial_analysis_tools_spark/queries*.py;
                deterministic float policy documented there).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from whitebox_geospatial_analysis_tools_spark import queries as _Q  # noqa: E402
from whitebox_geospatial_analysis_tools_spark.plans.pipeline import flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _Q.all_queries()


def oracle_sql() -> dict[str, str]:
    return _Q.all_oracles()
