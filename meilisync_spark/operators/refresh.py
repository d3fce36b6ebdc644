"""Shadow refresh with atomic swap (S13, ``meilisync refresh``).

Reference flow (meilisync/meili.py:34-71 driven by main.py:143-176):
record the current stream position *before* reading (so changes made
during the rebuild replay afterwards), bulk-load a ``{index}_tmp``
shadow index, ``swap_indexes``, drop tmp.

Spark realization: write the full snapshot to a staging directory,
then atomically swap it into place with a filesystem rename. On a real
deployment with a table format this is ``CREATE OR REPLACE TABLE`` /
``INSERT OVERWRITE`` (snapshot-isolated swap); the rename here gives
the same "readers see old-or-new, never half" contract on a
rename-atomic filesystem.

Scale notes: the bulk write is a plain partitioned parquet write — no
shuffle unless the caller asks to repartition by the pk bucket (do, for
merge locality of later CDC applies).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def refresh_data(
    df: DataFrame,
    index_path: str,
    bucket_by: str | None = None,
    num_buckets: int | None = None,
) -> int:
    """Rebuild the index table at ``index_path`` from ``df`` via a
    shadow path + atomic swap. Returns the number of rows loaded
    (the reference returns the inserted count, meilisync/meili.py:71).
    """
    tmp = f"{index_path}_tmp-{uuid.uuid4().hex[:8]}"  # ≡ "{index}_tmp" (meili.py:37)
    old = f"{index_path}_old-{uuid.uuid4().hex[:8]}"
    if bucket_by and num_buckets:
        df = df.repartition(num_buckets, bucket_by)
    df.write.mode("overwrite").parquet(tmp)
    # count from the written files so the returned number is what
    # readers will actually see
    n = df.sparkSession.read.parquet(tmp).count()
    if os.path.exists(index_path):
        os.rename(index_path, old)
    os.rename(tmp, index_path)
    shutil.rmtree(old, ignore_errors=True)  # ≡ drop tmp (meili.py:69)
    return n


def read_index(spark: SparkSession, index_path: str) -> DataFrame:
    return spark.read.parquet(index_path)
