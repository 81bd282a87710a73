"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship aggregation at sf0.001; ``queries`` /
``oracle_sql`` expose the operator registry (SURVEY.md §2 keys,
implemented in hocr_de_noising_spark/queries/*). Keys without oracle
SQL are intentionally rows-only (approximate or non-SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hocr_de_noising_spark.queries import QUERIES  # noqa: E402

_TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["tpch_q1"]["fn"](spark, os.path.join(_TESTDATA, "sf0.001"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec["fn"] for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query key."""
    return {
        name: spec["sql"] for name, spec in QUERIES.items() if spec["sql"] is not None
    }
