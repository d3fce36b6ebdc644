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
