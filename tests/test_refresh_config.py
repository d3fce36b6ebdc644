"""Tests for the shadow-refresh swap (S13), consistency check (A1-A3)
and the config surface (Settings/Sync, plugin loading)."""

from __future__ import annotations

import os

from pyspark.sql import Row

from meilisync_spark.config import Settings, Sync, load_plugin
from meilisync_spark.operators.check import count_check
from meilisync_spark.operators.refresh import read_index, refresh_data


def test_refresh_swap_atomic(spark, tmp_path):
    index = str(tmp_path / "index")
    n = refresh_data(spark.createDataFrame([Row(id=i, v=i * 10) for i in range(5)]), index)
    assert n == 5
    assert {r.id for r in read_index(spark, index).collect()} == set(range(5))
    # rebuild with different contents swaps atomically; old dirs cleaned
    n = refresh_data(spark.createDataFrame([Row(id=i, v=0) for i in range(3)]), index)
    assert n == 3
    assert read_index(spark, index).count() == 3
    leftovers = [d for d in os.listdir(tmp_path) if "_tmp" in d or "_old" in d]
    assert leftovers == []
    # symlink layout: the index path is a link that always resolves to
    # exactly one live version dir; superseded versions are gone
    assert os.path.islink(index)
    versions = [d for d in os.listdir(tmp_path) if d.startswith("index_v-")]
    assert len(versions) == 1
    assert os.path.realpath(index) == str(tmp_path / versions[0])


def test_refresh_sweeps_crash_leftovers(spark, tmp_path):
    """Stale staging/version dirs from a crashed writer disappear on
    the next refresh; the live version is untouched."""
    index = str(tmp_path / "index")
    refresh_data(spark.createDataFrame([Row(id=1, v=1)]), index)
    os.makedirs(str(tmp_path / "index_v-deadbeef"))
    os.makedirs(str(tmp_path / "index_tmp-deadbeef"))
    os.makedirs(str(tmp_path / "index_old-deadbeef"))
    refresh_data(spark.createDataFrame([Row(id=2, v=2)]), index)
    entries = set(os.listdir(tmp_path))
    assert "index_v-deadbeef" not in entries
    assert "index_tmp-deadbeef" not in entries
    assert "index_old-deadbeef" not in entries
    assert {r.id for r in read_index(spark, index).collect()} == {2}


def test_refresh_bucketing(spark, tmp_path):
    index = str(tmp_path / "bucketed")
    df = spark.createDataFrame([Row(id=i, v=i) for i in range(100)])
    refresh_data(df, index, bucket_by="id", num_buckets=4)
    files = [f for f in os.listdir(index) if f.endswith(".parquet")]
    assert len(files) == 4


def test_count_check(spark):
    a = spark.createDataFrame([Row(x=i) for i in range(10)])
    b = spark.createDataFrame([Row(x=i) for i in range(10)])
    c = spark.createDataFrame([Row(x=i) for i in range(7)])
    out = {r.table: r for r in count_check({"ok": (a, b), "drifted": (a, c)}).collect()}
    assert out["ok"].consistent and out["ok"].source_count == 10
    assert not out["drifted"].consistent and out["drifted"].index_count == 7


def test_settings_routing_and_defaults():
    s = Settings.from_dict(
        {
            "sink": {"index_path": "/tmp/idx", "insert_size": 1000},
            "sync": [
                {"table": "users", "pk": "user_id", "full": True,
                 "fields": {"user_id": None, "name": "full_name"}},
                {"table": "orders"},
            ],
        }
    )
    assert s.get_sync("users").pk == "user_id"
    assert s.get_sync("orders").pk == "id"  # reference default (settings.py:41)
    assert s.get_sync("orders").index_name == "orders"  # index defaults to table
    assert s.get_sync("missing") is None  # unrouted tables are dropped (P3)
    assert s.tables == ["users", "orders"]
    assert s.sink.insert_size == 1000 and s.sink.insert_interval is None


def test_plugin_loading_applies_batch_transform(spark):
    fn = load_plugin("pyspark.sql.functions.upper")  # any dotted callable
    assert callable(fn)


def test_compact_table_merges_small_files(spark, tmp_path):
    """Append-heavy layout (one file set per micro-batch) compacts to
    ~target-sized files behind the atomic symlink swap: same rows, far
    fewer files, still refreshable afterwards."""
    import glob
    import os

    from meilisync_spark.operators.refresh import compact_table, refresh_data

    index = str(tmp_path / "corpus")
    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    refresh_data(df.repartition(40), index)

    def files():
        return glob.glob(os.path.join(index, "**", "*.parquet"), recursive=True)

    before = {r.doc_id for r in spark.read.parquet(index).collect()}
    assert len(files()) == 40
    n = compact_table(spark, index, target_file_bytes=1 << 30)
    assert n == len(files()) == 1
    assert {r.doc_id for r in spark.read.parquet(index).collect()} == before
    # the swap stayed atomic: path is a live symlink, old version gone
    assert os.path.islink(index)


def test_compact_table_preserves_bucketed_cdc_layout(spark, tmp_path):
    """Compacting a bucket=-partitioned CDC index keeps the hive layout
    and the _meta.json layout contract, so the next bucketed apply still
    prunes to touched buckets instead of exploding on a flat layout."""
    import os

    from meilisync_spark.operators.bucketed import (
        apply_changes_bucketed,
        init_bucketed_index,
        read_meta,
    )
    from meilisync_spark.operators.refresh import compact_table

    index = str(tmp_path / "idx")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(200)], "pk int, val string"
    )
    init_bucketed_index(base, index, pk="pk", num_buckets=8)
    before = {(r.pk, r.val) for r in spark.read.parquet(index).drop("bucket").collect()}
    compact_table(spark, index, target_file_bytes=1 << 30)
    real = os.path.realpath(index)
    assert sorted(e for e in os.listdir(real) if e.startswith("bucket=")) == [
        f"bucket={b}" for b in sorted(range(8), key=str)
    ]
    assert read_meta(index) == {"num_buckets": 8, "pk": "pk"}
    # a post-compaction apply merges normally and sees every old row
    changes = spark.createDataFrame(
        [(0, 1, "update", "v0-new"), (999, 2, "create", "fresh")],
        "pk int, seq long, op string, val string",
    )
    apply_changes_bucketed(spark, index, changes, pk="pk", num_buckets=8)
    got = {(r.pk, r.val) for r in spark.read.parquet(index).drop("bucket").collect()}
    expected = (before - {(0, "v0")}) | {(0, "v0-new"), (999, "fresh")}
    assert got == expected
