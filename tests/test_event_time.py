"""Event-time streaming operators: multi-batch runs must converge to
the batch aggregate (windowed stats) and be batch-boundary-independent
(stateful user totals)."""

from __future__ import annotations

import os
import time

import duckdb

from meilisync_spark.streaming.windowed import run_user_totals, run_windowed_stats
from tests.conftest import SF_SMOKE


def _ts_ordered_chunks(workdir: str, n: int = 3) -> str:
    """Split the event log into n files in *event-time* order with
    increasing mtimes — so a trailing watermark never drops rows."""
    con = duckdb.connect()
    out = os.path.join(workdir, "events_by_ts")
    os.makedirs(out)
    total = con.sql(f"SELECT count(*) FROM '{SF_SMOKE}/events.parquet'").fetchone()[0]
    per = (total + n - 1) // n
    for i in range(n):
        path = os.path.join(out, f"chunk_{i}.parquet")
        con.sql(
            f"COPY (SELECT * FROM '{SF_SMOKE}/events.parquet' "
            f"ORDER BY ts, event_id LIMIT {per} OFFSET {i * per}) "
            f"TO '{path}' (FORMAT PARQUET)"
        )
        os.utime(path, (time.time() - 100 + i, time.time() - 100 + i))
    return out


def test_windowed_stats_multibatch_equals_batch(spark, duck, tmp_path):
    stream_dir = _ts_ordered_chunks(str(tmp_path))
    out = str(tmp_path / "state")
    run_windowed_stats(
        spark, stream_dir, out, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    got = {
        (r.hour_start, r.event_type): (r.n, str(r.total_value))
        for r in spark.read.parquet(out).collect()
    }
    con = duck(SF_SMOKE)
    expected = {
        (hs, et): (n, str(tv))
        for hs, et, n, tv in con.sql(
            """
            SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT), event_type,
                   count(*), CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
            FROM events GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == expected


def test_user_totals_multibatch_equals_batch(spark, duck, tmp_path):
    stream_dir = _ts_ordered_chunks(str(tmp_path))
    out = str(tmp_path / "state")
    run_user_totals(
        spark, stream_dir, out, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    got = {
        r.user_id: (r.n_events, r.total_cents, r.last_event_id)
        for r in spark.read.parquet(out).collect()
    }
    con = duck(SF_SMOKE)
    expected = {
        u: (n, c, e)
        for u, n, c, e in con.sql(
            """
            SELECT user_id, count(*),
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT),
                   max(event_id)
            FROM events GROUP BY user_id
            """
        ).fetchall()
    }
    assert got == expected
