"""layout_report — the parquet layout doctor (round 8).

Ground truth comes from two independent readers over the SAME files:
pyarrow footers (what the operator itself reads, asserted via a
DIFFERENT code path here) and DuckDB's parquet_metadata() — so the
distributed mapInPandas plumbing, not the metadata library, is what
the test exercises.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from meilisync_spark.operators.layout import layout_report


def _write(path, n_rows, row_group_size):
    t = pa.table(
        {
            "doc_id": pa.array(range(n_rows), pa.int64()),
            "text": pa.array([f"doc {i} text" for i in range(n_rows)]),
        }
    )
    pq.write_table(t, path, row_group_size=row_group_size)


def test_layout_report_matches_duckdb_metadata(spark, tmp_path):
    _write(str(tmp_path / "a.parquet"), 10_000, row_group_size=1_000)
    _write(str(tmp_path / "b.parquet"), 5_000, row_group_size=5_000)
    got = {
        r.file: r for r in layout_report(spark, str(tmp_path)).collect()
    }
    assert set(got) == {"a.parquet", "b.parquet"}

    con = duckdb.connect()
    for name in got:
        p = str(tmp_path / name)
        rgs, rows, max_rg = con.sql(
            "SELECT count(*), sum(r), max(r) FROM ("
            "  SELECT DISTINCT row_group_id, row_group_num_rows AS r"
            f"  FROM parquet_metadata('{p}'))"
        ).fetchone()
        assert got[name].row_groups == rgs, name
        assert got[name].rows == rows, name
        assert got[name].max_rg_rows == max_rg, name
        assert got[name].file_bytes == os.path.getsize(p), name


def test_layout_report_flags_unsplittable_big_file(spark, tmp_path, monkeypatch):
    """A big single-row-group file must be flagged; a same-size chunked
    file must not. Thresholds are lowered so the fixture stays small —
    the flag logic, not the constants, is under test."""
    import meilisync_spark.operators.layout as L

    monkeypatch.setattr(L, "SPLIT_TARGET_BYTES", 16 * 1024)
    # pin floor binds inside layout_report from sources.parquet —
    # patch the value the function reads
    import meilisync_spark.sources.parquet as P

    monkeypatch.setattr(L, "SPREAD_PIN_MIN_BYTES", 32 * 1024, raising=False)
    _write(str(tmp_path / "solid.parquet"), 30_000, row_group_size=1_000_000)
    _write(str(tmp_path / "chunked.parquet"), 30_000, row_group_size=1_000)
    got = {r.file: r for r in layout_report(spark, str(tmp_path)).collect()}
    assert got["solid.parquet"].row_groups == 1
    assert got["solid.parquet"].needs_rewrite is True
    assert got["chunked.parquet"].row_groups == 30
    assert got["chunked.parquet"].needs_rewrite is False


def test_layout_report_single_table_and_missing(spark, tmp_path):
    _write(str(tmp_path / "documents.parquet"), 1_000, row_group_size=500)
    rep = layout_report(spark, str(tmp_path), table="documents").collect()
    assert len(rep) == 1 and rep[0].row_groups == 2
    with pytest.raises(FileNotFoundError):
        layout_report(spark, str(tmp_path / "nope"))
