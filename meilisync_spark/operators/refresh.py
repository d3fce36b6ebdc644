"""Shadow refresh with atomic swap (S13, ``meilisync refresh``).

Reference flow (meilisync/meili.py:34-71 driven by main.py:143-176):
record the current stream position *before* reading (so changes made
during the rebuild replay afterwards), bulk-load a ``{index}_tmp``
shadow index, ``swap_indexes``, drop tmp.

Spark realization: write the full snapshot to a *versioned* directory
(``{index}_v-<tag>``), then atomically repoint the ``index`` symlink at
it (symlink replacement via ``rename`` is a single atomic syscall on
POSIX). Readers resolve the symlink at open time and see exactly one
complete version — old or new, never half, never "no index" (the
two-rename dance this replaces had a gap where the path didn't exist,
and a crash between renames stranded the index under a random suffix).
The previous version directory is removed after the repoint: a reader
that resolved the symlink *before* the swap and is still mid-scan can
lose files — the single-writer/short-scan contract of a plain-parquet
sink; a production deployment uses a table format
(``CREATE OR REPLACE TABLE`` — snapshot-isolated) where this whole
module is one SQL statement. Stale ``_v-*``/``_tmp-*``/``_old-*``
leftovers from a crashed writer are swept on the next refresh.

On a real deployment with a table format this is ``CREATE OR REPLACE
TABLE`` / ``INSERT OVERWRITE`` (snapshot-isolated swap).

Scale notes: the bulk write is a plain partitioned parquet write — no
shuffle unless the caller asks to repartition by the pk bucket (do, for
merge locality of later CDC applies).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _sweep_stale(index_path: str, keep: set[str]) -> None:
    """Remove version/staging leftovers from crashed earlier writers —
    everything matching this index's suffix convention except ``keep``
    (single-writer contract; the reference's start loop is likewise one
    process per config)."""
    parent, name = os.path.split(index_path.rstrip("/"))
    if not os.path.isdir(parent or "."):
        return
    for entry in os.listdir(parent or "."):
        full = os.path.join(parent, entry)
        if os.path.realpath(full) in keep:
            continue
        if (
            entry.startswith(f"{name}_v-")
            or entry.startswith(f"{name}_tmp-")
            or entry.startswith(f"{name}_old-")
            or entry.startswith(f"{name}_lnk-")
        ):
            if os.path.islink(full):
                os.unlink(full)
            else:
                shutil.rmtree(full, ignore_errors=True)


def refresh_data(
    df: DataFrame,
    index_path: str,
    bucket_by: str | None = None,
    num_buckets: int | None = None,
    partition_by: Sequence[str] | None = None,
) -> int:
    """Rebuild the index table at ``index_path`` from ``df`` via a
    versioned write + atomic symlink repoint. Returns the number of
    rows loaded (the reference returns the inserted count,
    meilisync/meili.py:71). ``partition_by`` writes the version with a
    hive partition layout (used by :func:`compact_table` to preserve
    the ``hb=``/``bucket=`` directory schemes the streaming appliers
    prune on)."""
    tag = uuid.uuid4().hex[:8]
    version = f"{index_path}_v-{tag}"  # ≡ "{index}_tmp" (meili.py:37)
    prev_target = os.path.realpath(index_path) if os.path.islink(index_path) else None
    _sweep_stale(index_path, keep={prev_target} if prev_target else set())
    if bucket_by and num_buckets:
        df = df.repartition(num_buckets, bucket_by)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(version)
    # count from the written files so the returned number is what
    # readers will actually see
    n = df.sparkSession.read.parquet(version).count()
    if os.path.islink(index_path) or not os.path.exists(index_path):
        # normal path: stage a symlink, rename over the old one — a
        # single atomic syscall; readers see old-or-new, never neither
        staged = f"{index_path}_lnk-{tag}"
        os.symlink(version, staged)
        os.rename(staged, index_path)
    else:
        # legacy real-directory layout: migrate to the symlink layout
        # (one non-atomic swap, then every later refresh is atomic)
        old = f"{index_path}_old-{tag}"
        os.rename(index_path, old)
        os.symlink(version, index_path)
        shutil.rmtree(old, ignore_errors=True)
    if prev_target and os.path.realpath(index_path) != prev_target:
        shutil.rmtree(prev_target, ignore_errors=True)  # ≡ drop tmp (meili.py:69)
    return n


def read_index(spark: SparkSession, index_path: str) -> DataFrame:
    return spark.read.parquet(index_path)


def _partition_cols(real_path: str) -> list[str]:
    """Discover the hive partition-column chain from the directory
    layout (``col=value`` subdirectories, possibly nested). Layout is
    the source of truth, not the dataframe schema: a partition key is
    only a directory name, and flattening it into data files silently
    breaks the ``hb=``/``bucket=`` pruning the streaming appliers rely
    on (and hides every pre-existing row from basePath readers)."""
    cols: list[str] = []
    path = real_path
    while os.path.isdir(path):
        subs = [
            e
            for e in os.listdir(path)
            if "=" in e
            and not e.startswith((".", "_"))  # compaction version dirs
            and os.path.isdir(os.path.join(path, e))
        ]
        names = {e.split("=", 1)[0] for e in subs}
        if len(names) != 1:
            break
        cols.append(names.pop())
        path = os.path.join(path, subs[0])
    return cols


def compact_table(
    spark: SparkSession,
    index_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction for append-heavy tables (the corpus-ingest
    index gains one file set per micro-batch; a year of 10-second
    batches is millions of files whose listing alone dominates scan
    setup). Rewrites the table into ceil(bytes / target) files via the
    same versioned-write + atomic-symlink-repoint as refresh_data —
    readers see the old file set or the new one, never a mix. Returns
    the resulting file count.

    Hive-partitioned layouts (the corpus-ingest ``hb=`` index, the CDC
    ``bucket=`` index) are preserved: the rewrite re-applies
    ``partitionBy`` on the discovered directory keys and carries the
    layout metadata file over, so the per-batch partition pruning —
    and the rows themselves — survive compaction. One task per
    partition-key hash, so each partition directory compacts to one
    file (a partition is sized to fit an executor by construction —
    operators/bucketed.py).

    O(table) I/O by definition, so like rebucket_index this is a
    planned maintenance job, not something a batch triggers; on a table
    format it is OPTIMIZE/rewrite_data_files. Unpartitioned layouts use
    coalesce (not repartition): merging files needs no shuffle, only
    fewer write tasks reading more input splits each."""
    real = os.path.realpath(index_path)
    pcols = _partition_cols(real)
    # mergeSchema: bucketed CDC indexes are drift-safe via per-bucket
    # schema union (read_buckets does the same) — compaction must not
    # drop a column that only newer buckets carry
    df = spark.read.option("mergeSchema", "true").parquet(index_path)
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(real)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-total // target_file_bytes))
    # sidecar metadata rides along with the rewrite: the bucket layout
    # record (_meta.json) AND the ANN index's quantizer halves
    # (_ann_meta.json — losing it would leave the compacted code
    # partitions unservable: no codebooks, no centroid routing)
    sidecars: dict[str, str] = {}
    for name in ("_meta.json", "_ann_meta.json"):
        p = os.path.join(real, name)
        if os.path.isfile(p):
            with open(p) as fh:
                sidecars[name] = fh.read()
    if pcols:
        refresh_data(
            df.repartition(n_files, *pcols), index_path, partition_by=pcols
        )
    else:
        refresh_data(df.coalesce(n_files), index_path)
    real = os.path.realpath(index_path)
    for name, body in sidecars.items():
        with open(os.path.join(real, name), "w") as fh:
            fh.write(body)
    return sum(f.endswith(".parquet") for _, _, fs in os.walk(real) for f in fs)
