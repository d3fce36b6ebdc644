"""Structured Streaming shell — the reference's `meilisync start` loop
(meilisync/main.py:71-140) as a micro-batch pipeline.

Mapping (SURVEY.md §2.9):

- asyncio event loop + buffer + interval flusher  → the micro-batch
  engine itself; ``trigger(processingTime=insert_interval)`` is T3,
  file-count batch sizing is T2, ``availableNow`` is the backfill
  catch-up T5, and tiny-trigger is per-event mode T4.
- progress store (file/redis, meilisync/progress/*) → the stream's
  ``checkpointLocation`` (offsets written after each commit, same
  write-then-commit order as main.py:110-120 ⇒ at-least-once, made
  effectively-once by the idempotent pk MERGE).
- per-event apply (meili.py:142-151) → ``foreachBatch`` calling the
  *batch* operators: normalize → compact (A5) → MERGE apply — the
  same functions the oracle checks, so streaming correctness reduces
  to batch correctness plus the harness.
- plugin pre/post hooks (U1/U2) → optional ``DataFrame -> DataFrame``
  transforms around the apply.

Batch-boundary semantics note (shared with the reference): compaction
is per-buffer, so a create followed in the SAME batch by a sparse
update collapses to the update (the create's payload is gone —
meilisync/event.py:10-13 has identical behavior). Final state therefore
depends on batch boundaries exactly as the reference's depends on its
flush points; tests pin both single-batch and multi-batch shapes.

Scale notes: state lives in the index table, not in the stream (no
flatMapGroupsWithState needed — T7); each micro-batch shuffles only on
pk for the MERGE. With a table format the rewrite becomes MERGE INTO
with file pruning; the parquet fallback swaps via the shadow path
(operators/refresh.py).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meilisync_spark.operators.apply import apply_changes
from meilisync_spark.operators.refresh import refresh_data
from meilisync_spark.sources.events import normalize_events
from meilisync_spark.sources.parquet import _nanos_timestamp_cols

PAYLOAD_COLS = ["ts", "value", "k"]


def read_event_stream(
    spark: SparkSession,
    events_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming scan of an append-only CDC event directory (S4-S6's
    Spark form; in production this is Kafka/Debezium — the file source
    keeps the harness hermetic). File order = arrival order.

    A single-file path is staged into a one-symlink directory (the file
    source requires a directory basePath). Nanos parquet timestamps get
    the same floor-to-micros conversion the batch loader applies.
    """
    nanos = _nanos_timestamp_cols(events_path)
    if os.path.isfile(events_path):
        staging = tempfile.mkdtemp(prefix="mls_src_")
        os.symlink(events_path, os.path.join(staging, os.path.basename(events_path)))
        src_dir = staging
    else:
        src_dir = events_path
    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # file-source lists oldest-first so seq order follows file order
    reader = reader.option("latestFirst", "false")
    df = reader.parquet(src_dir)
    for col in nanos:
        if isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def _empty_index(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [], "pk long, ts timestamp, value double, k long"
    )


def run_cdc_pipeline(
    spark: SparkSession,
    events_path: str,
    index_path: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int | None = None,
    processing_interval: str | None = None,
    available_now: bool = True,
    pre_batch: Callable[[DataFrame], DataFrame] | None = None,
    post_batch: Callable[[DataFrame], None] | None = None,
    timeout_sec: float | None = 120.0,
):
    """Run the CDC pipeline until caught up (``available_now``) or until
    ``timeout_sec``. Returns the StreamingQuery (stopped if awaited)."""
    events = read_event_stream(spark, events_path, max_files_per_trigger)
    normalized = normalize_events(events)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if pre_batch is not None:  # U1 plugin chain, vectorized
            batch_df = pre_batch(batch_df)
        if os.path.exists(index_path):
            base = spark.read.parquet(index_path)
        else:
            base = _empty_index(spark)
        new_state = apply_changes(base, batch_df, pk="pk", payload_cols=PAYLOAD_COLS)
        # shadow-write + atomic swap so concurrent readers never see a
        # half-written index (S13 semantics per micro-batch)
        refresh_data(new_state.select("pk", *PAYLOAD_COLS), index_path)
        if post_batch is not None:  # U2 post-write hook
            post_batch(batch_df)

    writer = (
        normalized.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)  # T1 progress store
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)  # T5 catch-up
    elif processing_interval:
        writer = writer.trigger(processingTime=processing_interval)  # T3
    q = writer.start()
    if timeout_sec is not None:
        try:
            q.awaitTermination(timeout_sec)
        finally:
            if q.isActive:
                q.stop()
        # surface foreachBatch failures instead of reporting a silent
        # "caught up" (the reference loudly retries on stream errors,
        # meilisync/source/mysql.py:127-135 — swallowing is worse)
        if q.exception() is not None:
            raise q.exception()
    return q
