"""Unit tests: as-of join semantics, JDBC/Kafka connector builders, and
the Debezium envelope normalizer (hermetic — no live DB/broker)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from meilisync_spark.operators.asof import asof_join
from meilisync_spark.sources.cdc_connectors import (
    jdbc_snapshot_options,
    kafka_cdc_options,
    normalize_debezium,
)


def test_asof_backward_inclusive_and_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, 10, "t-a"), (1, 5, "t-b"), (2, 8, "t-c")], "k long, t long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 10, 1, 100.0), (1, 10, 2, 200.0), (1, 12, 3, 999.0), (2, 7, 4, 7.0)],
        "k long, t long, seq long, q double",
    )
    out = asof_join(
        left, right.withColumnRenamed("q", "quote"),
        by="k", left_ts="t", right_ts="t", right_cols=["quote"], right_seq="seq",
    )
    got = {r.tag: r.quote for r in out.collect()}
    # inclusive match at equal ts; tie among right rows resolves to max seq
    assert got["t-a"] == 200.0
    # no right row at-or-before ts=5 → NULL
    assert got["t-b"] is None
    assert got["t-c"] == 7.0


def test_asof_rejects_column_collision(spark):
    df = spark.createDataFrame([(1, 1, 1.0)], "k long, t long, v double")
    try:
        asof_join(df, df, by="k", left_ts="t", right_ts="t", right_cols=["v"])
    except ValueError as e:
        assert "collide" in str(e)
    else:
        raise AssertionError("expected ValueError on colliding right_cols")


def test_jdbc_snapshot_options_partitioned_projection():
    fmt, opts = jdbc_snapshot_options(
        "jdbc:mysql://db:3306/app",
        "users",
        pk="id",
        fields={"id": None, "name": "full_name"},
        num_partitions=16,
        lower_bound=0,
        upper_bound=1_000_000,
    )
    assert fmt == "jdbc"
    # projection/rename pushed into the source query (P1, ≡ the
    # reference's SELECT list, meilisync/source/mysql.py:37-40)
    assert opts["dbtable"] == "(SELECT id, name AS full_name FROM users) AS t"
    # partitioned ranges replace LIMIT/OFFSET pagination (S1/S2)
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "10000"


def test_kafka_cdc_options_resume_and_sizing():
    fmt, opts = kafka_cdc_options(
        "broker:9092", "cdc.app.users", max_offsets_per_trigger=5000
    )
    assert fmt == "kafka"
    assert opts["startingOffsets"] == "earliest"  # S7 resume default
    assert opts["maxOffsetsPerTrigger"] == "5000"  # T2 batch sizing


def _dbz(op, before, after, table="users", ts_ms=1700000000000):
    return json.dumps(
        {"payload": {"op": op, "before": before, "after": after,
                     "ts_ms": ts_ms, "source": {"table": table}}}
    )


def test_normalize_debezium_envelope(spark):
    payload_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    rows = [
        (_dbz("c", None, {"id": 1, "name": "a"}),),
        (_dbz("r", None, {"id": 2, "name": "b"}),),  # snapshot read → create
        (_dbz("u", {"id": 1, "name": "a"}, {"id": 1, "name": "a2"}),),
        (_dbz("d", {"id": 2, "name": "b"}, None),),  # payload from `before`
        (_dbz("x", None, {"id": 9, "name": "z"}),),  # unknown op → dropped (P5)
        (_dbz("c", None, {"id": 3, "name": "other"}, table="other"),),  # routed out (P3)
    ]
    df = spark.createDataFrame(rows, "value string")
    out = normalize_debezium(df, payload_schema, pk="id", tables=["users"]).collect()
    ops = sorted((r.op, r.pk) for r in out)
    assert ops == [("create", 1), ("create", 2), ("delete", 2), ("update", 1)]
    by_op = {(r.op, r.pk): r for r in out}
    assert by_op[("update", 1)].payload.name == "a2"
    assert by_op[("delete", 2)].payload.id == 2  # delete keeps the pk (S11)
    assert all(r.table == "users" for r in out)
