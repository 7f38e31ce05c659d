"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship 1-minute rollup on sf0.001;
``queries()``/``oracle_sql()`` expose the operator registry in
``pneuma_treatment_spark/queries.py`` (Spark impl + DuckDB oracle pairs).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pneuma_treatment_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.rollup_1m(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.Q)


def oracle_sql() -> dict[str, str]:
    return dict(_q.SQL)
