"""Table-format sink: the ``MERGE INTO`` twin of ``apply_changes``.

Everywhere SCALE.md says "on a table format this is one statement",
this module is that statement. The plain-parquet paths
(operators/apply.py + refresh.py's shadow-write/atomic-symlink swap,
operators/bucketed.py's touched-bucket rewrite) are honest and tested,
but they carry a documented single-writer/short-scan contract: a
reader mid-scan during a swap can lose files
(operators/refresh.py:16-21). A transactional table format (Delta
here; Iceberg is the same shape) replaces all of that with one
``MERGE INTO`` under snapshot isolation — readers pin a snapshot,
writers commit atomically, file-level pruning touches only the files
holding matched keys, and concurrent-writer conflicts are detected
instead of silently interleaved.

Import-gated exactly like PIL/soundfile in operators/multimodal.py:
this container ships no delta-spark, so construction raises an
actionable error without it and the equivalence test skips; the MERGE
semantics are pinned against :func:`apply_changes`'s oracle-checked
behavior when the package is present
(tests/test_settings_pipeline.py::test_delta_apply_matches_flat_apply).

Reference parity: this is the same sink contract as
meilisync/meili.py:121-151 (S9 add / S10 partial update / S11 delete)
— create = full-document replace, update = partial (only non-NULL
fields overwrite, Q4), delete drops the pk.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meilisync_spark.operators.apply import apply_changes
from meilisync_spark.operators.compaction import compact_last_wins


def _delta_table():
    try:
        from delta.tables import DeltaTable  # type: ignore
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "the Delta sink needs the 'delta-spark' package (pip install "
            "delta-spark, plus spark.sql.extensions="
            "io.delta.sql.DeltaSparkSessionExtension and "
            "spark.sql.catalog.spark_catalog="
            "org.apache.spark.sql.delta.catalog.DeltaCatalog on the "
            "session) — or use the parquet layouts "
            "(operators/apply.py, operators/bucketed.py)"
        ) from e
    return DeltaTable


def apply_changes_delta(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    *,
    pk: str = "pk",
    seq_col: str = "seq",
    op_col: str = "op",
    payload_cols: Sequence[str],
) -> None:
    """Apply one compacted CDC micro-batch to a Delta table at
    ``table_path`` with a single ``MERGE INTO`` — byte-for-byte the
    same final state as :func:`apply_changes` + rewrite, minus the
    rewrite:

    - ``create``  → matched rows replace every payload column (full-
      document semantics, S9); unmatched rows insert.
    - ``update``  → matched rows take ``coalesce(change, current)`` per
      column (partial update, S10/Q4); unmatched rows insert the
      non-NULL fields (same as the flat merge's NULL base side).
    - ``delete``  → matched rows are deleted (S11); unmatched deletes
      are no-ops.

    Scale shape: the batch is last-wins compacted (A5) before the
    merge, so the MERGE source carries one row per touched pk; Delta
    prunes the target to the files whose min/max pk ranges can match
    (O(touched files), not O(table)), commits atomically, and leaves
    readers on their snapshot — the transactional form of what
    ``apply_changes_bucketed`` approximates with hive buckets.

    Bootstrap: a missing table is created from the batch applied to an
    empty base via the SAME :func:`apply_changes` fold, so first-batch
    semantics cannot drift from the oracle-checked path.
    """
    import os

    DeltaTable = _delta_table()
    if not DeltaTable.isDeltaTable(spark, table_path):
        if os.path.exists(table_path):
            # an existing NON-Delta path (e.g. a parquet index from the
            # default sink) must never be treated as a missing table:
            # the bootstrap overwrite would commit a _delta_log that
            # references only this batch's files, silently vanishing
            # every previously-synced document from the served view
            raise ValueError(
                f"{table_path} exists but is not a Delta table — refusing "
                "to bootstrap over it; migrate the parquet index first "
                "(e.g. spark.read.parquet(...).write.format('delta') to a "
                "new path) or point --sink-format delta at a fresh path"
            )
        empty = spark.createDataFrame(
            [], changes.select(pk, *payload_cols).schema
        )
        boot = apply_changes(
            empty, changes, pk=pk, seq_col=seq_col, op_col=op_col,
            payload_cols=payload_cols,
        )
        boot.write.format("delta").mode("overwrite").save(table_path)
        return

    last = compact_last_wins(changes, [pk], seq_col).alias("c")
    base = DeltaTable.forPath(spark, table_path)
    replace_set = {c: F.col(f"c.{c}") for c in payload_cols}
    partial_set = {
        c: F.coalesce(F.col(f"c.{c}"), F.col(f"b.{c}")) for c in payload_cols
    }
    insert_vals = {pk: F.col(f"c.{pk}"), **replace_set}
    (
        base.alias("b")
        .merge(last, f"b.{pk} = c.{pk}")
        .whenMatchedDelete(condition=f"c.{op_col} = 'delete'")
        .whenMatchedUpdate(condition=f"c.{op_col} = 'create'", set=replace_set)
        .whenMatchedUpdate(condition=f"c.{op_col} = 'update'", set=partial_set)
        .whenNotMatchedInsert(condition=f"c.{op_col} <> 'delete'", values=insert_vals)
        .execute()
    )
