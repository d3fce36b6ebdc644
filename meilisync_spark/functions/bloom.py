"""Bloom-filter sidecar for append-only key indexes.

The streaming near-dedup probe (streaming/corpus_ingest.py) answers an
existence question per batch band: "does the stored band index contain
any row with my (band_idx, band_hash)?" For a steady-state trickle the
answer is almost always NO — the batch is new text — yet the probe
still opens and scans every bb= bucket the batch touches (measured 7 s
of the 12 s staged batch at 500k docs, INGEST_STAGE_PROBE.json). A
Bloom filter over the index's keys gives the NO answers without
touching the index at all: only bloom-POSITIVE bands proceed to the
real (exact) probe, and the bb= pruning shrinks to their buckets.

Correctness contract — ONE-SIDED error, and the side matters:

- ``contains == False`` MUST mean the key was never added. A false
  negative would silently skip the exact probe and re-admit a
  near-duplicate: wrong results, undetectable.
- ``contains == True`` means "maybe": the exact probe runs and decides.
  False positives cost only wasted probe work.

Callers therefore maintain a bloom-BEFORE-data write ordering: the
sidecar is updated and persisted before the keys' rows are appended to
the index. A crash between the two leaves extra bits (false positives
on keys whose rows never landed) — never missing bits. The reverse
ordering would make the crash window a correctness hole. An absent or
unreadable sidecar is always recoverable: rebuild from the index it
summarizes (``build_from_df``), which restores exactly the safe
superset invariant.

Design notes for 100 TB:

- The filter is a flat bitmap sized at build time (power of two).
  Membership bits come from double hashing: positions
  ``(h1 + i*h2) mod m`` for i in 0..k-1, with h1/h2 two independent
  64-bit xxhash64 values computed JVM-side (whole-stage codegen) so
  build and probe agree on bit positions by construction.
- Batch UPDATES are O(batch): the two hash columns of the batch's keys
  (a few longs per row) are collected and the bits set driver-side in
  numpy. No bitmap-sized shuffle per batch.
- REBUILDS are distributed: each partition ORs its keys into a local
  bitmap, zlib-compresses it (sparse partition bitmaps compress ~100×),
  and the driver ORs the per-partition results. Bitmap traffic is
  bounded by partitions, not rows.
- MEMBERSHIP tests are Arrow-batched (mapInPandas) against the
  broadcast bitmap — a bit-gather into a shared byte array is the one
  step Catalyst genuinely cannot express.
- Saturation degrades fpp, never correctness. ``projected_fpp`` tracks
  the standard (1 - e^{-kn/m})^k estimate from the add counter; callers
  rebuild at a larger size when it crosses their threshold.

Spark 3.3+ has an internal bloom pair (``bloom_filter_agg`` /
``might_contain``) used by runtime row-level filtering, but it is not
public SQL/DataFrame API — this module implements the same shape with
public primitives only.

Reference analogue: none (the reference has no index-probe surface);
this serves the north-star streaming dedup extension.
"""

from __future__ import annotations

import json
import math
import os
import tempfile
import zlib
from typing import Iterator

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAGIC = "MLSBLOOM"
FORMAT_VERSION = 1
DEFAULT_BITS = 1 << 27  # 16 MiB: ~14M keys at 1% fpp
K_HASHES = 7  # optimal k for m/n ≈ 9.6 (the 1% design point)


def bloom_hash_cols(*cols: Column) -> list[Column]:
    """The two 64-bit base hashes, as JVM-side columns. xxhash64's seed
    is fixed (42) in the public API, so the second hash derives
    independence from a prepended constant column instead."""
    return [
        F.xxhash64(*cols).alias("_bh1"),
        F.xxhash64(F.lit(0x9E3779B9), *cols).alias("_bh2"),
    ]


def _positions(h1: np.ndarray, h2: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(len, k) uint64 bit positions via double hashing. n_bits is a
    power of two so mod is a mask."""
    mask = np.uint64(n_bits - 1)
    steps = np.arange(k, dtype=np.uint64)
    # uint64 arithmetic wraps mod 2^64, which is exactly what double
    # hashing wants before the final mask
    return (h1[:, None] + steps[None, :] * h2[:, None]) & mask


def _as_u64(values) -> np.ndarray:
    a = np.asarray(values, dtype=np.int64)
    return a.view(np.uint64)


class BloomSidecar:
    """In-memory filter + its persistence. One file: a JSON header line
    (magic, version, n_bits, k, n_added) then the raw bitmap."""

    def __init__(self, n_bits: int = DEFAULT_BITS, k: int = K_HASHES,
                 bits: np.ndarray | None = None, n_added: int = 0):
        if n_bits & (n_bits - 1):
            raise ValueError(f"n_bits must be a power of two, got {n_bits}")
        self.n_bits = n_bits
        self.k = k
        self.n_added = n_added
        self.bits = (
            bits if bits is not None else np.zeros(n_bits // 8, dtype=np.uint8)
        )
        if self.bits.nbytes != n_bits // 8:
            raise ValueError(
                f"bitmap is {self.bits.nbytes} B, expected {n_bits // 8}"
            )

    # --- core bit ops (numpy, vectorized) ---

    def add_hashes(self, h1: np.ndarray, h2: np.ndarray) -> None:
        if len(h1) == 0:
            return
        pos = _positions(_as_u64(h1), _as_u64(h2), self.n_bits, self.k).ravel()
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
        )
        self.n_added += len(h1)

    def contains_hashes(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        if len(h1) == 0:
            return np.zeros(0, dtype=bool)
        pos = _positions(_as_u64(h1), _as_u64(h2), self.n_bits, self.k)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        return bit.all(axis=1)

    def projected_fpp(self, extra_keys: int = 0) -> float:
        """Standard estimate (1 - e^{-kn/m})^k from the add counter.
        The counter overcounts replayed batches — which only OVERstates
        fpp, triggering growth early, never late."""
        n = self.n_added + extra_keys
        return (1.0 - math.exp(-self.k * n / self.n_bits)) ** self.k

    # --- persistence (atomic single file) ---

    def save(self, path: str) -> None:
        header = json.dumps(
            {
                "magic": MAGIC,
                "version": FORMAT_VERSION,
                "n_bits": self.n_bits,
                "k": self.k,
                "n_added": self.n_added,
            }
        ).encode()
        d = os.path.dirname(os.path.abspath(path)) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(prefix="._bloom_", dir=d)
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(header + b"\n")
                fh.write(self.bits.tobytes())
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    @classmethod
    def load(cls, path: str) -> "BloomSidecar | None":
        """None when absent. Raises on a corrupt file — the caller
        decides whether to rebuild (the safe recovery) or fail; silently
        treating corruption as absence would be fine too (rebuild), but
        loud beats lucky."""
        if not os.path.exists(path):
            return None
        with open(path, "rb") as fh:
            header = fh.readline()
            meta = json.loads(header)
            if meta.get("magic") != MAGIC:
                raise ValueError(f"{path}: not a bloom sidecar")
            if meta.get("version") != FORMAT_VERSION:
                raise ValueError(
                    f"{path}: format version {meta.get('version')} "
                    f"(engine reads {FORMAT_VERSION})"
                )
            raw = fh.read()
        expected = meta["n_bits"] // 8
        if len(raw) != expected:
            raise ValueError(
                f"{path}: bitmap is {len(raw)} B, header says {expected}"
            )
        return cls(
            n_bits=meta["n_bits"],
            k=meta["k"],
            bits=np.frombuffer(raw, dtype=np.uint8).copy(),
            n_added=meta["n_added"],
        )


def size_for(n_keys: int, fpp: float = 0.01,
             floor_bits: int = DEFAULT_BITS,
             cap_bits: int = 1 << 33) -> int:
    """Power-of-two bitmap size for n keys at the target fpp
    (m = -n ln p / ln²2), clamped to [floor, cap]. The 1 GiB cap bounds
    driver/broadcast memory — past it the filter runs saturated-but-
    correct and the caller's fpp threshold stops asking for growth it
    can't have (SCALE.md: at that point the honest answer is sharding
    the filter with the index, one sidecar per key range)."""
    wanted = int(-n_keys * math.log(fpp) / (math.log(2) ** 2)) if n_keys else 0
    bits = floor_bits
    while bits < wanted and bits < cap_bits:
        bits *= 2
    return bits


def add_df(bloom: BloomSidecar, df: DataFrame, cols: list[str]) -> None:
    """O(batch) update: collect the two hash longs per key row and set
    bits driver-side. Bounded by the batch the caller is already
    holding — never bitmap-sized traffic."""
    rows = df.select(*bloom_hash_cols(*[F.col(c) for c in cols])).collect()
    if rows:
        h1 = np.fromiter((r[0] for r in rows), dtype=np.int64, count=len(rows))
        h2 = np.fromiter((r[1] for r in rows), dtype=np.int64, count=len(rows))
        bloom.add_hashes(h1, h2)


def build_from_df(df: DataFrame, cols: list[str], n_bits: int,
                  k: int = K_HASHES) -> BloomSidecar:
    """Distributed rebuild: per-partition bitmaps OR-ed on the driver.
    Each partition ships one zlib-compressed bitmap (sparse partition
    maps compress ~100×), so driver traffic is O(partitions), not
    O(rows)."""
    hashed = df.select(*bloom_hash_cols(*[F.col(c) for c in cols]))
    nb, kk = n_bits, k

    def _part(batches: Iterator) -> Iterator:
        import pandas as pd

        bits = np.zeros(nb // 8, dtype=np.uint8)
        n = 0
        for pdf in batches:
            h1 = pdf["_bh1"].to_numpy(dtype=np.int64)
            h2 = pdf["_bh2"].to_numpy(dtype=np.int64)
            pos = _positions(
                h1.view(np.uint64), h2.view(np.uint64), nb, kk
            ).ravel()
            np.bitwise_or.at(
                bits, (pos >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
            )
            n += len(h1)
        if n:
            yield pd.DataFrame(
                {"bm": [zlib.compress(bits.tobytes(), 1)], "n": [n]}
            )

    parts = hashed.mapInPandas(_part, "bm binary, n long").collect()
    bloom = BloomSidecar(n_bits=nb, k=kk)
    for row in parts:
        bloom.bits |= np.frombuffer(
            zlib.decompress(row["bm"]), dtype=np.uint8
        )
        bloom.n_added += row["n"]
    return bloom


def maybe_contains(df: DataFrame, bloom: BloomSidecar, cols: list[str],
                   out_col: str = "maybe_seen") -> DataFrame:
    """df + a boolean column: False = key definitely never added (skip
    the exact probe), True = maybe (probe decides). Arrow-batched gather
    against the broadcast bitmap."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        (bloom.bits.tobytes(), bloom.n_bits, bloom.k)
    )
    hashed = df.select("*", *bloom_hash_cols(*[F.col(c) for c in cols]))
    out_schema = hashed.drop("_bh1", "_bh2").schema.add(out_col, "boolean")

    def _test(batches: Iterator) -> Iterator:
        raw, nb, kk = bc.value
        bits = np.frombuffer(raw, dtype=np.uint8)
        for pdf in batches:
            h1 = pdf["_bh1"].to_numpy(dtype=np.int64)
            h2 = pdf["_bh2"].to_numpy(dtype=np.int64)
            res = pdf.drop(columns=["_bh1", "_bh2"])
            if len(h1):
                pos = _positions(h1.view(np.uint64), h2.view(np.uint64), nb, kk)
                byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
                hit = ((byte >> (pos & np.uint64(7)).astype(np.uint8))
                       & np.uint8(1)).all(axis=1)
            else:
                hit = np.zeros(0, dtype=bool)
            res[out_col] = hit
            yield res

    return hashed.mapInPandas(_test, out_schema)
