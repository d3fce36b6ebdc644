"""Parquet layout doctor — detect scan-parallelism pathologies before
they serialize a cluster.

Round 8's headline diagnosis (SCALE.md "Round-8 scale changes"): a big
single-row-group parquet file is UNSPLITTABLE — Spark plans byte-range
splits, but a scan task only reads row groups whose start offset falls
in its range, so one ~1M-row group means ONE real scan task however
many partitions were planned, and Catalyst fuses pushed-down filters
into that serial task. The engine self-defends (`sources/parquet.py::
spread` pins such files), but the RIGHT fix is the data layout — this
module is the audit that tells an operator which files to rewrite.

Scale shape: the file listing is driver-side (bounded: a directory
listing), footer reads are DISTRIBUTED — one Arrow batch of paths per
task, `pyarrow.parquet.read_metadata` per file (footer-only IO, no
data pages). At 100 TB / ~100k files that is a few MB of metadata per
task; the report is ~5 scalar columns per file. Paths must be readable
from executors (local fs / NFS / fuse mounts here; on HDFS/S3 swap the
reader for the corresponding pyarrow filesystem — same shape).

Rewriting a flagged file is one pass:
``spark.read.parquet(f).write.option("parquet.block.size", ...)`` or
the layout-preserving compact in `operators/refresh.py`.

No reference analogue (meilisync never manages storage layout); this
is engine-side operational tooling, like `operators/profile.py`.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from meilisync_spark.sources.parquet import SPREAD_PIN_MIN_BYTES

# a row group whose byte span exceeds the split target caps scan
# parallelism below what byte-range planning assumes (Spark default
# maxPartitionBytes = 128 MB — get_spark pins the same value)
SPLIT_TARGET_BYTES = 128 * 1024 * 1024

LAYOUT_SCHEMA = (
    "file string, file_bytes long, row_groups int, rows long, "
    "max_rg_rows long, avg_rg_bytes long, needs_rewrite boolean"
)


def layout_report(spark: SparkSession, table_dir: str, table: str | None = None) -> DataFrame:
    """(file, file_bytes, row_groups, rows, max_rg_rows, avg_rg_bytes,
    needs_rewrite) — one row per parquet file under ``table_dir`` (or
    just ``<table>.parquet`` when given), from a distributed
    footer-only scan.

    ``needs_rewrite`` flags files whose scan will serialize: at least
    the unsplittable-pin floor in size (64 MB, the same constant
    spread() uses) AND an average row-group span above the 128 MB
    split target — i.e. byte-range planning promises more parallelism
    than the row groups can deliver. Rewrite such files with a bounded
    row-group size (one pass) and the whole pin path in spread()
    becomes dead code for your data.
    """
    if table is not None:
        candidates = [os.path.join(table_dir, f"{table}.parquet")]
    else:
        candidates = sorted(
            glob.glob(os.path.join(table_dir, "**", "*.parquet"), recursive=True)
        )
    files = [f for f in candidates if os.path.isfile(f)]
    if not files:
        raise FileNotFoundError(f"no parquet files under {table_dir!r}")

    sc = spark.sparkContext
    fdf = spark.createDataFrame([(f,) for f in files], "path string")
    if len(files) > 1:
        fdf = fdf.repartition(min(len(files), sc.defaultParallelism))

    # bind thresholds by VALUE: the closure must not reference module
    # globals (workers can't import the package from a non-repo cwd)
    pin_floor = SPREAD_PIN_MIN_BYTES
    split_target = SPLIT_TARGET_BYTES

    def _read_footers(batches):
        import os as _os

        import pandas as pd
        import pyarrow.parquet as _pq

        for pdf in batches:
            out = []
            for p in pdf["path"]:
                md = _pq.read_metadata(p)
                n_rg = md.num_row_groups
                rg_rows = [md.row_group(i).num_rows for i in range(n_rg)]
                fbytes = _os.path.getsize(p)
                avg_rg = fbytes // max(n_rg, 1)
                out.append(
                    (
                        _os.path.basename(p),
                        fbytes,
                        n_rg,
                        md.num_rows,
                        max(rg_rows) if rg_rows else 0,
                        avg_rg,
                        bool(fbytes >= pin_floor and avg_rg > split_target),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "file", "file_bytes", "row_groups", "rows",
                    "max_rg_rows", "avg_rg_bytes", "needs_rewrite",
                ],
            )

    return fdf.mapInPandas(_read_footers, LAYOUT_SCHEMA)
