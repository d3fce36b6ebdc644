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
    ``payload_schema``. ``source.lsn`` (postgres) / ``source.pos``
    (mysql binlog) are the connector's total-order position fields —
    absent fields simply decode as NULL, so one schema serves both."""
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
                            T.StructType(
                                [
                                    T.StructField("table", T.StringType()),
                                    T.StructField("lsn", T.LongType()),
                                    T.StructField("pos", T.LongType()),
                                ]
                            ),
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
    - ``seq`` (the last-wins total order, A5): the source's log
      position — postgres ``source.lsn``, else mysql ``source.pos``,
      else the Kafka partition offset when the frame carries one
      (Debezium keys messages by pk, so a pk's events share a
      partition and the offset totally orders them), else ``ts_ms``.
      ts_ms alone is millisecond-granular and NOT unique per pk — two
      same-key changes in one millisecond would make last-wins
      arbitrary.
    """
    v = F.from_json(F.col(value_col).cast("string"), debezium_value_schema(payload_schema))
    p = v.getField("payload")
    op_src = p.getField("op")
    op: Column = F.lit(None).cast("string")
    for src, dst in reversed(list(DEBEZIUM_OP_MAP.items())):
        op = F.when(op_src == src, F.lit(dst)).otherwise(op)
    payload = F.when(op_src == "d", p.getField("before")).otherwise(p.getField("after"))
    source = p.getField("source")
    seq_candidates = [source.getField("lsn"), source.getField("pos")]
    if "offset" in df.columns:  # kafka frame
        seq_candidates.append(F.col("offset"))
    seq_candidates.append(p.getField("ts_ms"))
    out = df.select(
        F.coalesce(*seq_candidates).alias("seq"),
        F.timestamp_millis(p.getField("ts_ms")).alias("ts"),
        source.getField("table").alias("table"),
        op.alias("op"),
        payload.getField(pk).alias("pk"),
        payload.alias("payload"),
    ).where(F.col("op").isNotNull())
    if tables:
        out = out.where(F.col("table").isin(*tables))
    return out


# Mongo change-stream operationType → EventType: exactly the three ops
# the reference's $match pipeline admits (meilisync/source/mongo.py:44-50)
MONGO_OP_MAP: dict[str, str] = {
    "insert": "create",
    "update": "update",
    "delete": "delete",
}


def mongo_change_stream_schema(payload_schema: T.StructType) -> T.StructType:
    """Schema of a MongoDB change-stream event document (the shape the
    reference's ``db.watch`` yields, meilisync/source/mongo.py:55-74).
    ``updateDescription.updatedFields`` reuses ``payload_schema`` —
    absent fields decode as NULL, which is exactly the sparse-update
    payload the partial MERGE expects (Q4/S10)."""
    return T.StructType(
        [
            T.StructField("operationType", T.StringType()),
            T.StructField(
                "clusterTime", T.StructType([T.StructField("t", T.LongType()),
                                             T.StructField("i", T.LongType())])
            ),
            T.StructField(
                "ns",
                T.StructType(
                    [T.StructField("db", T.StringType()),
                     T.StructField("coll", T.StringType())]
                ),
            ),
            T.StructField(
                "documentKey", T.StructType([T.StructField("_id", T.StringType())])
            ),
            T.StructField("fullDocument", payload_schema),
            T.StructField(
                "updateDescription",
                T.StructType([T.StructField("updatedFields", payload_schema)]),
            ),
        ]
    )


def normalize_mongo_change_stream(
    df: DataFrame,
    payload_schema: T.StructType,
    *,
    value_col: str = "value",
    tables: list[str] | None = None,
) -> DataFrame:
    """Mongo change-stream envelope → the engine's normalized event
    schema ``(seq, ts, table, op, pk, payload struct)`` — completing
    S4-S6's production trio beside :func:`normalize_debezium`.

    Reference parity (meilisync/source/mongo.py:55-74):

    - op classification (P4): insert/update/delete → create/update/
      delete; other operationTypes (drop, rename, invalidate) are
      filtered out — the reference's ``$match`` pipeline does the same
      server-side (mongo.py:44).
    - payload: ``fullDocument`` for insert,
      ``updateDescription.updatedFields`` for update (the sparse
      partial-update payload, Q4 — mongo.py:62-64), ``documentKey``
      alone for delete (mongo.py:65-67: the delete path carries only
      the pk).
    - pk: ``documentKey._id`` stringified on every op, exactly the
      reference's ``data["_id"] = str(change["documentKey"]["_id"])``
      (mongo.py:68, F4 pk stringification).
    - ``seq``: clusterTime (t, i) packed into one 64-bit position —
      Mongo's own total order (t = epoch seconds, i = intra-second
      counter); the Kafka partition offset, when the frame carries
      one, is appended as a tiebreak-free fallback.
    - routing (P3): optional ``tables`` filter on ``ns.coll`` ≡ the
      reference's per-sync collection routing.
    """
    v = F.from_json(
        F.col(value_col).cast("string"), mongo_change_stream_schema(payload_schema)
    )
    op_src = v.getField("operationType")
    op: Column = F.lit(None).cast("string")
    for src, dst in reversed(list(MONGO_OP_MAP.items())):
        op = F.when(op_src == src, F.lit(dst)).otherwise(op)
    payload = (
        F.when(op_src == "update", v.getField("updateDescription").getField("updatedFields"))
        .when(op_src == "insert", v.getField("fullDocument"))
        .otherwise(F.lit(None).cast(payload_schema))
    )
    ct = v.getField("clusterTime")
    seq_candidates = [
        ct.getField("t") * F.lit(2**20) + F.coalesce(ct.getField("i"), F.lit(0))
    ]
    if "offset" in df.columns:  # kafka frame
        seq_candidates.append(F.col("offset"))
    out = df.select(
        F.coalesce(*seq_candidates).alias("seq"),
        F.timestamp_seconds(ct.getField("t")).alias("ts"),
        v.getField("ns").getField("coll").alias("table"),
        op.alias("op"),
        # F4: pk stringification on every op kind (mongo.py:68)
        v.getField("documentKey").getField("_id").cast("string").alias("pk"),
        payload.alias("payload"),
    ).where(F.col("op").isNotNull())
    if tables:
        out = out.where(F.col("table").isin(*tables))
    return out
