"""Serialized localCheckpoint — the one pin the engine uses.

``DataFrame.localCheckpoint`` without a storage level stores the
checkpoint DESERIALIZED (MEMORY_AND_DISK_DESER, the JVM default).
Corpus-scale text/array rows inflate 3-5× as deserialized JVM objects,
so a query that pins a signature table and a band table at 2M docs
parks ~10 GB in the block manager; the blocks release only when a GC
notices the dead references, and the ContextCleaner's eviction then
runs CONCURRENTLY with the next query. Measured on minhash_lsh_pairs
at 2M docs, three back-to-back runs in one JVM: 54 s / 128-194 s /
55-191 s — the middle run pays the previous run's eviction churn, and
the scaling harness's min-of-2 recorded the inflated number
(SCALING.json's first 1M→2M exponent read 1.47 for an operator whose
stage decomposition is ~0.7).

Serialized storage (MEMORY_AND_DISK — the serialized level in pyspark;
the _DESER suffix marks the JVM default) shrinks the pinned bytes to
roughly the shuffle-compressed size, at a per-consumer deserialization
cost that is noise next to the hash/shingle work these pins guard.
``spread()`` (sources/parquet.py) made the same call for its scan
pins; this helper makes it the package-wide default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


# the serialized level, for call sites that keep the method-chain form:
# .localCheckpoint(eager, storageLevel=SER)
SER = StorageLevel.MEMORY_AND_DISK


def pin(df: DataFrame, eager: bool = False) -> DataFrame:
    """Serialized localCheckpoint. Same laziness contract as the raw
    call: eager=False still executes upstream exchanges at CALL time
    under AQE (only the final stage is deferred) — time construction
    inside the measured span, as everywhere else in this engine."""
    return df.localCheckpoint(eager, storageLevel=StorageLevel.MEMORY_AND_DISK)
