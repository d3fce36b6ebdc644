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


def _write_skewed(path, big_rows, tiny_rows, tiny_groups, text_len=120):
    """One BIG row group followed by many tiny ones — the skew shape
    where the file-level AVERAGE hides the serializing group."""
    import hashlib

    def mk(n, off):
        txt = [
            (hashlib.sha256(f"{off+i}".encode()).hexdigest() * 4)[:text_len]
            for i in range(n)
        ]
        return pa.table(
            {
                "doc_id": pa.array(range(off, off + n), pa.int64()),
                "text": pa.array(txt),
            }
        )

    with pq.ParquetWriter(path, mk(1, 0).schema) as w:
        w.write_table(mk(big_rows, 0), row_group_size=big_rows)
        off = big_rows
        for _ in range(tiny_groups):
            w.write_table(mk(tiny_rows, off), row_group_size=tiny_rows)
            off += tiny_rows


def test_layout_report_flags_skewed_row_groups(spark, tmp_path, monkeypatch):
    """ADVICE r8: a file whose AVERAGE row-group span is under the
    split target but whose MAX group exceeds it still serializes on
    the big group — the verdict must use the max compressed span."""
    import meilisync_spark.operators.layout as L

    monkeypatch.setattr(L, "SPLIT_TARGET_BYTES", 64 * 1024)
    monkeypatch.setattr(L, "SPREAD_PIN_MIN_BYTES", 32 * 1024, raising=False)
    p = str(tmp_path / "skew.parquet")
    # big group ~ >64 KiB compressed; 40 tiny groups drag the average
    # far below the target
    _write_skewed(p, big_rows=2_000, tiny_rows=20, tiny_groups=40)
    got = {r.file: r for r in layout_report(spark, str(tmp_path)).collect()}
    r = got["skew.parquet"]
    assert r.row_groups == 41
    avg = r.file_bytes // r.row_groups
    assert avg <= 64 * 1024  # the old average-based verdict would pass it
    assert r.max_rg_bytes > 64 * 1024
    assert r.needs_rewrite is True


def test_layout_rewrite_fixes_flagged_file_in_place(spark, tmp_path, monkeypatch):
    """layout_rewrite: flagged file → atomic in-place rewrite with
    bounded row groups → audit clean, rows identical, path still a
    single parquet FILE."""
    import meilisync_spark.operators.layout as L
    from meilisync_spark.operators.layout import layout_rewrite

    monkeypatch.setattr(L, "SPLIT_TARGET_BYTES", 64 * 1024)
    monkeypatch.setattr(L, "SPREAD_PIN_MIN_BYTES", 32 * 1024, raising=False)
    p = str(tmp_path / "solid.parquet")
    _write_skewed(p, big_rows=4_000, tiny_rows=20, tiny_groups=3)
    before = sorted(
        (r.doc_id, r.text) for r in spark.read.parquet(p).collect()
    )
    done = layout_rewrite(spark, str(tmp_path), target_bytes=64 * 1024).collect()
    assert [r.file for r in done] == ["solid.parquet"]
    assert os.path.isfile(p)  # still a single file, not a part dir
    after = sorted((r.doc_id, r.text) for r in spark.read.parquet(p).collect())
    assert after == before
    rep = {r.file: r for r in layout_report(spark, str(tmp_path)).collect()}
    assert rep["solid.parquet"].needs_rewrite is False
    assert rep["solid.parquet"].max_rg_bytes <= 64 * 1024
    # idempotent: a clean dir rewrites nothing
    assert layout_rewrite(spark, str(tmp_path), target_bytes=64 * 1024).count() == 0


def test_cli_doctor_rewrite_closes_the_loop(spark, tmp_path, monkeypatch, capsys):
    """doctor CLI: pathological file → rc 2 audit-only → --rewrite →
    rc 0, clean re-audit, spread() pin path dead for the new layout."""
    import meilisync_spark.operators.layout as L
    import meilisync_spark.sources.parquet as P
    from meilisync_spark.cli import main

    monkeypatch.setattr(L, "SPLIT_TARGET_BYTES", 64 * 1024)
    monkeypatch.setattr(L, "SPREAD_PIN_MIN_BYTES", 32 * 1024, raising=False)
    monkeypatch.setattr(P, "SPREAD_PIN_MIN_BYTES", 32 * 1024)
    p = str(tmp_path / "docs.parquet")
    _write_skewed(p, big_rows=4_000, tiny_rows=20, tiny_groups=3)
    assert main(["doctor", "--path", str(tmp_path)]) == 2
    assert "REWRITE" in capsys.readouterr().out
    assert main(["doctor", "--path", str(tmp_path), "--rewrite"]) == 0
    out = capsys.readouterr().out
    assert "audit clean" in out and "pin path dead" in out
    # and a clean dir is rc 0 without --rewrite
    assert main(["doctor", "--path", str(tmp_path)]) == 0
