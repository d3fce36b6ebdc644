"""Production source connectors: JDBC snapshots and Kafka/Debezium CDC.

The reference reads MySQL/Postgres/Mongo directly — paginated SELECTs
for snapshots (meilisync/source/mysql.py:35-52, postgres.py:67-87) and
binlog/wal2json/change-stream tailing for increments (mysql.py:81-126,
postgres.py:89-163, mongo.py:49-74). The Spark-native equivalents:

- **Snapshot** → ``spark.read.format("jdbc")`` with a *partitioned*
  scan: ``partitionColumn=pk, lowerBound/upperBound/numPartitions``
  replaces LIMIT/OFFSET pagination (each executor reads one pk range
  concurrently; OFFSET pagination is O(n²) server work and serial).
  The ``fields`` projection happens source-side via ``dbtable`` as a
  subquery — same pushdown the reference builds into its SELECT list.
- **CDC stream** → Kafka topics carrying Debezium envelopes
  (``spark.readStream.format("kafka")``), the standard production
  transport for binlog/wal2json; :func:`normalize_debezium` maps the
  envelope onto the engine's normalized event schema (op
  classification P4, op-kind filter P5, table routing P3 — same
  contract as sources/events.py, so everything downstream — compaction,
  MERGE apply, streaming shell — is transport-agnostic).

This container ships neither JDBC drivers nor Kafka jars, so the
builders return (format, options) pairs and ``load()`` is a thin
wrapper the tests don't execute; ``normalize_debezium`` is a pure
DataFrame transform and IS tested hermetically on literal JSON.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Debezium op → EventType (meilisync/enums.py:4-7). 'r' (snapshot read)
# becomes create, matching the reference's backfill-as-creates
# (meilisync/meili.py:30-32).
DEBEZIUM_OP_MAP: dict[str, str] = {
    "c": "create",
    "r": "create",
    "u": "update",
    "d": "delete",
}


def jdbc_snapshot_options(
    url: str,
    table: str,
    *,
    pk: str = "id",
    fields: dict[str, str | None] | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetch_size: int = 10_000,
    **extra: str,
) -> tuple[str, dict[str, str]]:
    """Build the (format, options) for a partitioned JDBC snapshot scan.

    ``fields`` is the reference's projection/rename map (P1,
    meilisync/settings.py:44): pushed into the source query exactly as
    the reference builds its SELECT list (source/mysql.py:37-40).
    """
    if fields:
        select = ", ".join(
            f"{src} AS {alias}" if alias else src for src, alias in fields.items()
        )
        dbtable = f"(SELECT {select} FROM {table}) AS t"
    else:
        dbtable = table
    opts: dict[str, str] = {
        "url": url,
        "dbtable": dbtable,
        "fetchsize": str(fetch_size),
        **{k: str(v) for k, v in extra.items()},
    }
    if lower_bound is not None and upper_bound is not None:
        opts.update(
            partitionColumn=pk,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return "jdbc", opts


def jdbc_snapshot(spark: SparkSession, url: str, table: str, **kw) -> DataFrame:
    fmt, opts = jdbc_snapshot_options(url, table, **kw)
    return spark.read.format(fmt).options(**opts).load()


def kafka_cdc_options(
    brokers: str,
    topics: str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> tuple[str, dict[str, str]]:
    """(format, options) for the Kafka CDC stream (S4-S6's production
    transport). ``startingOffsets`` plays the resume-position role (S7);
    after the first run the checkpoint owns progress — exactly the
    reference's stored-progress-else-head rule (mysql.py:99-103)."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)  # T2 sizing
    return "kafka", opts


def kafka_cdc_stream(spark: SparkSession, brokers: str, topics: str, **kw) -> DataFrame:
    fmt, opts = kafka_cdc_options(brokers, topics, **kw)
    return spark.readStream.format(fmt).options(**opts).load()


def debezium_value_schema(payload_schema: T.StructType) -> T.StructType:
    """Schema of a Debezium message value for a table whose row type is
    ``payload_schema``."""
    return T.StructType(
        [
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("op", T.StringType()),
                        T.StructField("before", payload_schema),
                        T.StructField("after", payload_schema),
                        T.StructField("ts_ms", T.LongType()),
                        T.StructField(
                            "source",
                            T.StructType([T.StructField("table", T.StringType())]),
                        ),
                    ]
                ),
            )
        ]
    )


def normalize_debezium(
    df: DataFrame,
    payload_schema: T.StructType,
    *,
    pk: str = "id",
    value_col: str = "value",
    tables: list[str] | None = None,
) -> DataFrame:
    """Kafka Debezium envelope → the engine's normalized event schema
    ``(seq, ts, table, op, pk, payload struct)``.

    - op classification (P4): Debezium c/r/u/d → create/update/delete;
      unknown kinds dropped (P5) — note the engine *continues* past
      them rather than aborting the batch (reference quirk Q2,
      postgres.py:96-98, deliberately not replicated).
    - payload: ``after`` for create/update, ``before`` for delete (the
      delete path only needs the pk — meilisync/meili.py:136-137).
    - routing (P3): optional ``tables`` filter ≡ binlog ``only_tables``
      (mysql.py:92) — applied before decode so Kafka's predicate
      pushdown can skip whole messages.
    """
    v = F.from_json(F.col(value_col).cast("string"), debezium_value_schema(payload_schema))
    p = v.getField("payload")
    op_src = p.getField("op")
    op: Column = F.lit(None).cast("string")
    for src, dst in reversed(list(DEBEZIUM_OP_MAP.items())):
        op = F.when(op_src == src, F.lit(dst)).otherwise(op)
    payload = F.when(op_src == "d", p.getField("before")).otherwise(p.getField("after"))
    out = df.select(
        p.getField("ts_ms").alias("seq"),
        F.timestamp_millis(p.getField("ts_ms")).alias("ts"),
        p.getField("source").getField("table").alias("table"),
        op.alias("op"),
        payload.getField(pk).alias("pk"),
        payload.alias("payload"),
    ).where(F.col("op").isNotNull())
    if tables:
        out = out.where(F.col("table").isin(*tables))
    return out
