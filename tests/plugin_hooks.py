"""Importable plugin hooks for CLI/pipeline tests (loaded by dotted
path through meilisync_spark.config.load_plugin, like the reference's
plugin classes, meilisync/plugin.py:20-22). Order-sensitive on purpose:
double-then-add-one ≠ add-one-then-double."""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def double_value(df: DataFrame) -> DataFrame:
    return df.withColumn("value", F.col("value") * 2)


def add_one_value(df: DataFrame) -> DataFrame:
    return df.withColumn("value", F.col("value") + 1)


def double_amount(df: DataFrame) -> DataFrame:
    return df.withColumn("amount", F.col("amount") * 2)
