"""Deterministic sampling / splitting / mixture weighting — the
reproducibility layer of a training-data pipeline.

`df.sample()` is seeded per-partition, so its output changes whenever
the partitioning does — useless for a dataset contract. Everything
here decides membership from a *portable content hash of the row key*
(functions/hashing.py), which makes the sample (a) identical across
runs, cluster sizes, and engines (the DuckDB oracle reproduces it
bit-for-bit), (b) stable under repartition/backfill, and (c) a pure
scan-side filter — no shuffle, pushed next to the parquet reader.

The reference has no sampling surface at all; these are north-star
extension operators (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meilisync_spark.functions.hashing import duck_hash64, portable_hash64
from meilisync_spark.sources.parquet import spread

# hash buckets per unit of rate — rate resolution 0.01%
RATE_DENOM = 10_000

# train/val/test cut points over 100 hash buckets
SPLIT_TRAIN, SPLIT_VAL = 80, 90

# per-source mixture rates: srcN keeps ((N % 5) + 1)/5 of its docs —
# the "books are upweighted vs web" knob of a data-mixing recipe
N_SOURCES = 20


def source_rates() -> dict[str, float]:
    return {f"src{i}": ((i % 5) + 1) / 5 for i in range(N_SOURCES)}


def split_assign(docs: DataFrame) -> DataFrame:
    """(doc_id, bucket, split) — stable train/val/test assignment:
    bucket = hash(doc_id) % 100, split by fixed cut points. Adding new
    documents never moves an existing one between splits."""
    docs = spread(docs)
    bucket = portable_hash64(F.concat(F.lit("split:"), F.col("doc_id"))) % 100
    return docs.select("doc_id", bucket.alias("bucket")).select(
        "doc_id",
        "bucket",
        F.when(F.col("bucket") < SPLIT_TRAIN, "train")
        .when(F.col("bucket") < SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )


def split_assign_oracle_sql() -> str:
    h = duck_hash64("'split:' || doc_id")
    return f"""
    SELECT doc_id, {h} % 100 AS bucket,
           CASE WHEN {h} % 100 < {SPLIT_TRAIN} THEN 'train'
                WHEN {h} % 100 < {SPLIT_VAL} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """


SAMPLE_K = 5


def per_source_head(docs: DataFrame, k: int = SAMPLE_K) -> DataFrame:
    """(source, doc_id, rk) — a uniform k-document sample per source:
    rank docs within each source by portable hash of the key and keep
    the k smallest. This is distributed reservoir sampling done
    deterministically — the "k random rows per group" primitive for
    eyeballing / eval-set carving, stable across runs and engines.

    One shuffle on source; the rank is a per-group top-k (window +
    filter) which AQE executes with partial top-k pushdown; no global
    sort."""
    from pyspark.sql import Window

    docs = spread(docs)
    h = portable_hash64(F.concat(F.lit("head:"), F.col("doc_id")))
    w = Window.partitionBy("source").orderBy(F.asc("h"), F.asc("doc_id"))
    return (
        docs.select("source", "doc_id", h.alias("h"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("source", "doc_id", "rk")
    )


def per_source_head_oracle_sql(k: int = SAMPLE_K) -> str:
    h = duck_hash64("'head:' || doc_id")
    return f"""
    SELECT source, doc_id, rk FROM (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                                  ORDER BY {h}, doc_id) AS rk
        FROM documents
    ) WHERE rk <= {k}
    """


def mixture_sample(docs: DataFrame) -> DataFrame:
    """(doc_id, source, rate) — per-source weighted downsampling: doc
    kept iff hash(doc_id) lands under its source's rate. The rate table
    is a broadcast dim; the decision is per-row, so the operator is a
    scan-side filter with zero shuffle at any corpus size."""
    docs = spread(docs)
    spark = docs.sparkSession
    rates = spark.createDataFrame(
        sorted(source_rates().items()), "source string, rate double"
    )
    h = portable_hash64(F.concat(F.lit("mix:"), F.col("doc_id"))) % RATE_DENOM
    return (
        docs.join(F.broadcast(rates), "source")
        .where(h < F.col("rate") * RATE_DENOM)
        .select("doc_id", "source", "rate")
    )


def mixture_sample_oracle_sql() -> str:
    rates = ", ".join(f"('src{i}', {((i % 5) + 1) / 5})" for i in range(N_SOURCES))
    h = duck_hash64("'mix:' || doc_id")
    return f"""
    SELECT doc_id, source, CAST(rate AS DOUBLE) AS rate
    FROM documents
    JOIN (VALUES {rates}) r(source, rate) USING (source)
    WHERE {h} % {RATE_DENOM} < rate * {RATE_DENOM}
    """


# ---------------------------------------------------------------------------
# Temperature resampling (multinomial mixture flattening, T = 2)
# ---------------------------------------------------------------------------

def temperature_resample(docs: DataFrame) -> DataFrame:
    """(doc_id, source, rate) — temperature-flattened mixture sampling
    (the mT5/XLM-R recipe): target source shares q_s ∝ p_s^(1/T); the
    downsample-only realization keeps source s at
    ``rate_s = sqrt(min_count / count_s)`` for T = 2, so the rarest
    source keeps everything and head sources are damped toward it.

    T is fixed at 2 deliberately: the rate is then a bare ``sqrt`` of
    an exact integer ratio, and IEEE requires sqrt and division to be
    correctly rounded — so Spark and the DuckDB oracle compute the
    *bit-identical* threshold (a general ``pow(x, 1/T)`` is not
    correctly rounded and could flip a boundary hash). Membership is
    the same portable-hash filter as :func:`mixture_sample`: stable
    across runs, partitionings, and engines.

    Plan: one tiny count aggregate (map-side partials, |sources| rows),
    rates broadcast back — the corpus side stays a scan-side filter
    with zero shuffle."""
    docs = spread(docs)
    cnts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    mn = cnts.agg(F.min("cnt").alias("mn"))
    rates = cnts.crossJoin(F.broadcast(mn)).select(
        "source",
        F.sqrt(F.col("mn").cast("double") / F.col("cnt")).alias("rate"),
    )
    h = portable_hash64(F.concat(F.lit("temp:"), F.col("doc_id"))) % RATE_DENOM
    return (
        docs.join(F.broadcast(rates), "source")
        .where(h < F.col("rate") * RATE_DENOM)
        .select("doc_id", "source", "rate")
    )


def temperature_resample_oracle_sql() -> str:
    h = duck_hash64("'temp:' || doc_id")
    return f"""
    WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
    r AS (
        SELECT source,
               sqrt(CAST((SELECT min(cnt) FROM c) AS DOUBLE) / cnt) AS rate
        FROM c
    )
    SELECT doc_id, d.source, r.rate
    FROM documents d JOIN r ON d.source = r.source
    WHERE {h} % {RATE_DENOM} < r.rate * {RATE_DENOM}
    """


# ---------------------------------------------------------------------------
# Training order (deterministic global shuffle, sharded)
# ---------------------------------------------------------------------------

N_SHARDS = 16


def training_order(docs: DataFrame) -> DataFrame:
    """(doc_id, shard, pos) — the "shuffle the corpus for training"
    step as a deterministic pseudo-random permutation: shard =
    hash(doc) % S, position = rank by an independent hash within the
    shard. Reading shards in order, positions ascending, yields the
    same training order on every run and engine.

    Scale shape: the window is PARTITIONED by shard (never an
    unpartitioned global sort); shards are hash-balanced so each
    partition sorts ~N/S rows. At 100 TB you'd write the output
    partitioned by shard and each trainer reads its shard
    sequentially."""
    from pyspark.sql import Window

    docs = spread(docs)
    shard = portable_hash64(F.concat(F.lit("shard:"), F.col("doc_id"))) % N_SHARDS
    order_h = portable_hash64(F.concat(F.lit("order:"), F.col("doc_id")))
    w = Window.partitionBy("shard").orderBy(F.asc("oh"), F.asc("doc_id"))
    return (
        docs.select("doc_id", shard.alias("shard"), order_h.alias("oh"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
    )


def training_order_oracle_sql() -> str:
    sh = duck_hash64("'shard:' || doc_id")
    oh = duck_hash64("'order:' || doc_id")
    return f"""
    SELECT doc_id, shard, pos FROM (
        SELECT doc_id, {sh} % {N_SHARDS} AS shard,
               row_number() OVER (PARTITION BY {sh} % {N_SHARDS}
                                  ORDER BY {oh}, doc_id) AS pos
        FROM documents
    )
    """
