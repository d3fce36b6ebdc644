"""Snapshot sources (reference operators S1-S3, SURVEY.md §2.1).

The reference paginates full-table reads with ``ORDER BY pk LIMIT size
OFFSET o`` (meilisync/source/mysql.py:35-52) purely to bound memory; in
Spark a partitioned parquet scan already bounds memory per-task, so
"pagination" is the partitioning itself and the ORDER BY disappears
(SURVEY.md §2.6 O1). Column pruning (the reference's ``fields`` SELECT
list, source/mysql.py:37-40) happens at the parquet footer via
Catalyst's ColumnPruning — callers just ``.select``.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pyarrow.types as patypes

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _nanos_timestamp_cols(path: str) -> set[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — read from the footer
    (driver-side metadata only; no data read)."""
    f = path
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            return set()
        f = files[0]
    try:
        schema = pq.read_schema(f)
    except Exception:
        return set()
    return {
        fld.name
        for fld in schema
        if patypes.is_timestamp(fld.type) and fld.type.unit == "ns"
    }


def load_path(spark: SparkSession, path: str) -> DataFrame:
    """Scan an arbitrary parquet path with canonical timestamp handling.

    The session reads parquet NANOS timestamps as raw nanos longs
    (spark.sql.legacy.parquet.nanosAsLong) — convert them here to
    micros TimestampType with floor semantics (``div``), matching
    DuckDB's ns→µs narrowing, so both engines see identical values.
    All other timestamps become session-tz TIMESTAMP.
    """
    df = spark.read.parquet(path)
    for col in _nanos_timestamp_cols(path):
        if isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    for fld in df.schema.fields:
        if isinstance(fld.dataType, T.TimestampNTZType):
            df = df.withColumn(fld.name, F.col(fld.name).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Full snapshot scan of one table (S1/S2/S3 equivalent)."""
    return load_path(spark, table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition when the scan yields too few partitions
    for a CPU-dense stage (hashing/shingling/vector math).

    Local single-file parquet with one row group is unsplittable — the
    scan gives 1 partition and a compute-heavy stage runs on one core.
    At cluster scale the input has thousands of splits and this is a
    no-op (the condition is false), so no shuffle is added where the
    scan already provides parallelism.
    """
    sc = df.sparkSession.sparkContext
    target = parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def get_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Source-side count (A1, meilisync/source/mysql.py:54-59)."""
    return load_table(spark, sf_dir, name).count()
