"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`meilisync_spark.queries` — the engine's query
registry. Every registry entry is a pure ``(spark, sf_dir) ->
DataFrame`` plus (where SQL-expressible) the DuckDB oracle SQL with
column names aligned for the driver's sorted-by-name value-hash.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

from meilisync_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC MERGE-apply pipeline (compaction + partial-update
    merge + delete) over /root/testdata/sf0.001."""
    return _q.queries()["cdc_apply"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
