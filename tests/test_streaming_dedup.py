"""Streaming exactly-once dedup: duplicates must be dropped both within
a micro-batch (the union-redelivery in the runner) and across batch
boundaries (a later file replaying earlier events), as long as they
fall inside the watermark horizon."""

from __future__ import annotations

import os
import time

import duckdb

from meilisync_spark.streaming.dedup_stream import run_stream_dedup
from tests.conftest import SF_SMOKE


def test_cross_batch_redelivery_dropped(spark, tmp_path):
    workdir = str(tmp_path)
    stream_dir = os.path.join(workdir, "events_stream")
    os.makedirs(stream_dir)
    con = duckdb.connect()
    mid = con.sql(
        f"SELECT max(event_id) // 2 FROM '{SF_SMOKE}/events.parquet'"
    ).fetchone()[0]
    # batch 1: first half; batch 2: second half + a replay of 25 events
    # from batch 1 (crash-after-write redelivery across the boundary)
    con.sql(
        f"""COPY (SELECT * FROM '{SF_SMOKE}/events.parquet'
                  WHERE event_id <= {mid} ORDER BY event_id)
            TO '{stream_dir}/chunk_0.parquet' (FORMAT PARQUET)"""
    )
    time.sleep(1.1)  # distinct mtimes → file source preserves order
    con.sql(
        f"""COPY (SELECT * FROM '{SF_SMOKE}/events.parquet'
                  WHERE event_id > {mid}
                  OR event_id <= 25 ORDER BY event_id)
            TO '{stream_dir}/chunk_1.parquet' (FORMAT PARQUET)"""
    )

    out = os.path.join(workdir, "deduped")
    run_stream_dedup(
        spark, stream_dir, out, os.path.join(workdir, "ckpt"),
        max_files_per_trigger=1,
    )

    got = spark.read.parquet(out)
    ids = [r.event_id for r in got.select("event_id").collect()]
    n_src = con.sql(
        f"SELECT count(*) FROM '{SF_SMOKE}/events.parquet'"
    ).fetchone()[0]
    assert len(ids) == len(set(ids)) == n_src
