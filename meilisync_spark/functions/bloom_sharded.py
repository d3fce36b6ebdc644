"""Sharded Bloom sidecar: the scale path past the 1 GiB bitmap cap.

``LoggedBloom`` (functions/bloom.py) broadcasts its main bitmap to
probe a batch — the right shape while the bitmap is small, but
``size_for`` caps it at 1 GiB (2^33 bits) to bound driver/broadcast
memory, and past ~10⁹-10¹⁰ keys the filter runs saturated: correct,
yet the "definitely new" fast path quietly stops helping at exactly
the scale the engine targets (VERDICT r9, what's-wrong #1). This
module is the sharded form SCALE.md names: ONE filter per key-range
shard, so total capacity is shards × cap while no single bitmap —
and no broadcast at all — ever carries filter-sized bytes.

Sharding key: ``shard = pmod(xxhash64(key), n_shards)`` with
``n_shards`` a POWER OF TWO. The constraint is load-bearing for
cross-engine agreement: JVM ``pmod`` operates on the SIGNED 64-bit
hash while numpy shards the same value through a uint64 view, and
``(h mod 2^64) mod n == pmod(h, n)`` holds exactly when n divides
2^64.

Memory contract (the reason this class isn't just N LoggedBlooms):

- PROBES never materialize a bitmap anywhere. The batch's two hash
  longs flow through one ``mapInPandas``; each task ``np.memmap``s
  the shard files it touches and gathers bits through the OS page
  cache — a 40k-key batch touches ≤ k·40k pages regardless of bitmap
  size, and repeated batches hit warm pages. Files are replaced
  atomically (tmp + rename), so a memmap of the old inode stays
  self-consistent for its task. On an object-store cluster the same
  layout wants executor-local caching or a KV probe (SCALE.md).
- The DRIVER holds shard METADATA only (path, n_bits, k, n_added —
  read from the one-line file headers). Folds load / mutate / save
  ONE shard bitmap at a time; rebuilds stream per-shard compressed
  partition bitmaps and finalize one shard at a time. Peak driver
  memory is one shard (+ the bounded log), never shards × cap.

Maintenance mirrors LoggedBloom: ONE shared append-only delta log of
raw (h1, h2) pairs (O(batch) bytes per batch, no per-shard file
explosion), folded into the per-shard mains past FOLD_KEYS; growth is
UNIFORM (worst shard's projected fpp decides, all shards rebuilt
right-sized from the index in one distributed scan) because hash
sharding fills shards uniformly and per-shard sizes would force
per-shard delta builds on every bulk merge. Crash windows are the
same one-sided set: log-before-rows; shard files then manifest then
log-clear, so every crash point leaves either the old complete
sidecar or the new one plus a stale, harmlessly re-foldable log.

Layout::

    <prefix>_bloom_shards/manifest.json   {n_shards, version}
    <prefix>_bloom_shards/shard-NN.bin    BloomSidecar files
    <prefix>_bloom_log/                   shared with LoggedBloom

Reference analogue: none; serves the streaming-dedup extension.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meilisync_spark.functions.bloom import (
    FOLD_KEYS,
    K_HASHES,
    BloomSidecar,
    append_log_pairs,
    bloom_hash_cols,
    size_for,
)

MANIFEST = "manifest.json"
SHARDS_VERSION = 1
N_SHARDS_DEFAULT = 16

# prefix → (disk token, instance): same single-writer steady-state
# cache as bloom._LOAD_CACHE — headers are cheap but the log chunks
# are not, and the owner reloads every micro-batch.
_LOAD_CACHE: dict = {}


def _shard_of_np(h1: np.ndarray, n_shards: int) -> np.ndarray:
    return (h1.view(np.uint64) % np.uint64(n_shards)).astype(np.int64)


def shard_col(cols: list[str], n_shards: int):
    """JVM-side shard id — equals the numpy assignment because
    n_shards is a power of two (module docstring)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_shards))


@dataclass
class _ShardMeta:
    path: str
    header_len: int
    n_bits: int
    k: int
    n_added: int

    def projected_fpp(self, extra_keys: int = 0) -> float:
        import math

        n = self.n_added + extra_keys
        return (1.0 - math.exp(-self.k * n / self.n_bits)) ** self.k


def _read_meta(path: str) -> _ShardMeta:
    with open(path, "rb") as fh:
        header = fh.readline()
    m = json.loads(header)
    return _ShardMeta(path, len(header), m["n_bits"], m["k"], m["n_added"])


class ShardedBloom:
    """Same write/probe contract as LoggedBloom; per-shard bitmaps,
    metadata-only on the driver."""

    def __init__(self, prefix: str, shards: list[_ShardMeta],
                 pairs: np.ndarray):
        if len(shards) & (len(shards) - 1):
            raise ValueError(
                f"n_shards must be a power of two, got {len(shards)}"
            )
        self.prefix = prefix
        self.shards = shards
        self.pairs = pairs  # shared delta log, bounded by FOLD_KEYS

    # --- paths (log dir shared with LoggedBloom) ---

    @staticmethod
    def _shards_dir(prefix: str) -> str:
        return prefix + "_bloom_shards"

    @staticmethod
    def _log_dir(prefix: str) -> str:
        return prefix + "_bloom_log"

    @classmethod
    def _shard_path(cls, prefix: str, s: int) -> str:
        return os.path.join(cls._shards_dir(prefix), f"shard-{s:02d}.bin")

    @classmethod
    def exists(cls, prefix: str) -> bool:
        return os.path.isfile(os.path.join(cls._shards_dir(prefix), MANIFEST))

    @classmethod
    def _disk_token(cls, prefix: str):
        mp = os.path.join(cls._shards_dir(prefix), MANIFEST)
        mt = None
        if os.path.exists(mp):
            st = os.stat(mp)
            mt = (st.st_mtime_ns, st.st_size)
        ld = cls._log_dir(prefix)
        logs = (
            tuple(sorted(n for n in os.listdir(ld) if n.endswith(".npy")))
            if os.path.isdir(ld)
            else ()
        )
        return (mt, logs)

    def _refresh_cache(self) -> None:
        _LOAD_CACHE[self.prefix] = (self._disk_token(self.prefix), self)

    @classmethod
    def load_cached(cls, prefix: str) -> "ShardedBloom | None":
        """load(), but O(stat) when this driver already holds the
        current state — the steady-state micro-batch path, safe under
        the single-writer contract (the writer refreshes the token
        after every mutation; out-of-band changes force a real load)."""
        token = cls._disk_token(prefix)
        hit = _LOAD_CACHE.get(prefix)
        if hit is not None and hit[0] == token:
            return hit[1]
        sb = cls.load(prefix)
        if sb is None:
            _LOAD_CACHE.pop(prefix, None)
        else:
            _LOAD_CACHE[prefix] = (token, sb)
        return sb

    @property
    def n_shards(self) -> int:
        return len(self.shards)

    # --- lifecycle ---

    @classmethod
    def load(cls, prefix: str) -> "ShardedBloom | None":
        sd = cls._shards_dir(prefix)
        mp = os.path.join(sd, MANIFEST)
        if not os.path.isfile(mp):
            return None
        with open(mp) as fh:
            meta = json.load(fh)
        if meta.get("version") != SHARDS_VERSION:
            raise ValueError(
                f"{mp}: shards version {meta.get('version')} "
                f"(engine reads {SHARDS_VERSION})"
            )
        shards = []
        for s in range(meta["n_shards"]):
            p = cls._shard_path(prefix, s)
            if not os.path.isfile(p):
                raise ValueError(
                    f"{sd}: shard {s} missing — rebuild the sidecar "
                    "from the index (safe recovery)"
                )
            shards.append(_read_meta(p))
        ld = cls._log_dir(prefix)
        chunks = []
        if os.path.isdir(ld):
            for name in sorted(os.listdir(ld)):
                if name.endswith(".npy"):
                    chunks.append(np.load(os.path.join(ld, name)))
        pairs = (
            np.concatenate(chunks) if chunks
            else np.empty((0, 2), dtype=np.int64)
        )
        return cls(prefix, shards, pairs)

    @classmethod
    def convert_from_logged(cls, logged, index: DataFrame | None,
                            cols: list[str], target_fpp: float,
                            n_shards: int = N_SHARDS_DEFAULT,
                            ) -> "ShardedBloom":
        """The cap-crossing conversion: rebuild per-shard mains from
        index ∪ log in ONE distributed scan, persist them, then retire
        the logged form's main file. A crash mid-conversion leaves the
        logged sidecar intact (manifest lands only after every shard
        file) and the next load retries."""
        n_keys = (index.count() if index is not None else 0) + len(
            logged.pairs
        )
        per_shard = max(1, int(1.25 * n_keys) // n_shards)
        nbits = size_for(per_shard, fpp=target_fpp)
        os.makedirs(cls._shards_dir(logged.prefix), exist_ok=True)
        shards = _rebuild_shards(
            index, cols, n_shards, nbits, logged.prefix, logged.pairs
        )
        sb = cls(logged.prefix, shards, np.empty((0, 2), dtype=np.int64))
        sb._write_manifest_and_clear_log()
        from meilisync_spark.functions import bloom as _b

        lp = _b.LoggedBloom._main_path(logged.prefix)
        if os.path.exists(lp):
            os.remove(lp)
        _b._LOAD_CACHE.pop(logged.prefix, None)
        sb._refresh_cache()
        return sb

    @classmethod
    def remove(cls, prefix: str) -> None:
        _LOAD_CACHE.pop(prefix, None)
        sd, ld = cls._shards_dir(prefix), cls._log_dir(prefix)
        if os.path.isdir(sd):
            shutil.rmtree(sd)
        if os.path.isdir(ld):
            shutil.rmtree(ld)

    # --- queries ---

    def n_keys(self) -> int:
        return sum(m.n_added for m in self.shards) + len(self.pairs)

    def projected_fpp(self, extra_keys: int = 0) -> float:
        """Worst shard's estimate; log pairs and extras apportioned
        uniformly (hash sharding makes that the right prior)."""
        per = (len(self.pairs) + extra_keys) / self.n_shards
        return max(m.projected_fpp(int(per)) for m in self.shards)

    def mark(self, df: DataFrame, cols: list[str],
             out_col: str = "maybe_seen") -> DataFrame:
        """Batch membership mark, memmap-probed (module docstring).
        The delta log rides along as one SMALL driver-built bitmap
        broadcast (bounded by FOLD_KEYS pairs)."""
        spark = df.sparkSession
        specs = [(m.path, m.header_len, m.n_bits, m.k) for m in self.shards]
        delta = None
        if len(self.pairs):
            d = BloomSidecar(
                n_bits=size_for(len(self.pairs), fpp=1e-4,
                                floor_bits=1 << 17)
            )
            d.add_hashes(self.pairs[:, 0], self.pairs[:, 1])
            delta = spark.sparkContext.broadcast(
                (d.bits.tobytes(), d.n_bits, d.k)
            )
        n_shards = self.n_shards
        hashed = df.select("*", *bloom_hash_cols(*[F.col(c) for c in cols]))
        out_schema = hashed.drop("_bh1", "_bh2").schema.add(out_col, "boolean")

        def _test(batches: Iterator) -> Iterator:
            import numpy as _np

            maps: dict = {}

            def bits_of(s: int):
                if s not in maps:
                    path, off, nb, kk = specs[s]
                    maps[s] = (
                        _np.memmap(path, dtype=_np.uint8, mode="r",
                                   offset=off),
                        nb, kk,
                    )
                return maps[s]

            dview = None
            if delta is not None:
                db, dn, dk = delta.value
                dview = (_np.frombuffer(db, dtype=_np.uint8), dn, dk)

            def gather(bits, nb, kk, u1, u2):
                mask = _np.uint64(nb - 1)
                steps = _np.arange(kk, dtype=_np.uint64)
                pos = (u1[:, None] + steps[None, :] * u2[:, None]) & mask
                byte = bits[(pos >> _np.uint64(3)).astype(_np.int64)]
                return (
                    (byte >> (pos & _np.uint64(7)).astype(_np.uint8))
                    & _np.uint8(1)
                ).all(axis=1)

            for pdf in batches:
                h1 = pdf["_bh1"].to_numpy(dtype=_np.int64)
                h2 = pdf["_bh2"].to_numpy(dtype=_np.int64)
                res = pdf.drop(columns=["_bh1", "_bh2"])
                hit = _np.zeros(len(h1), dtype=bool)
                if len(h1):
                    u1, u2 = h1.view(_np.uint64), h2.view(_np.uint64)
                    shard = (u1 % _np.uint64(n_shards)).astype(_np.int64)
                    for s in _np.unique(shard):
                        rows = shard == s
                        bits, nb, kk = bits_of(int(s))
                        hit[rows] = gather(bits, nb, kk, u1[rows], u2[rows])
                    if dview is not None:
                        db, dn, dk = dview
                        hit |= gather(db, dn, dk, u1, u2)
                res[out_col] = hit
                yield res

        return hashed.mapInPandas(_test, out_schema)

    # --- writes (same entry points as LoggedBloom) ---

    def record_batch(self, df: DataFrame, cols: list[str],
                     index: DataFrame | None, target_fpp: float,
                     rebuild_bar: float) -> None:
        n_batch = df.count()
        if n_batch == 0:
            return
        if n_batch < FOLD_KEYS:
            self.append_df(df, cols)
            self.fold_if_due(index, cols, target_fpp, rebuild_bar)
            return
        # bulk: growth FIRST (a rebuild reads only the INDEX, so
        # merging first would lose keys whose rows haven't landed),
        # then the pre-existing log pairs fold on BOTH branches (the
        # LoggedBloom r9 lesson), then the batch's distributed
        # per-shard deltas OR in — one shard in driver memory at a time
        self._grow_if_needed(index, cols, target_fpp, rebuild_bar,
                             extra_keys=len(self.pairs) + n_batch)
        pair_shards = (
            _shard_of_np(self.pairs[:, 0], self.n_shards)
            if len(self.pairs) else None
        )
        parts = _collect_shard_parts(
            df, cols, self.n_shards, self.shards[0].n_bits
        )
        for s in range(self.n_shards):
            sc = BloomSidecar.load(self.shards[s].path)
            if pair_shards is not None and (pair_shards == s).any():
                rows = pair_shards == s
                sc.add_hashes(self.pairs[rows, 0], self.pairs[rows, 1])
            _or_parts_into(sc, parts.get(s, []))
            sc.save(self.shards[s].path)
            self.shards[s] = _read_meta(self.shards[s].path)
        self._write_manifest_and_clear_log()

    def append_df(self, df: DataFrame, cols: list[str]) -> None:
        """Identical O(batch) shared-log append as LoggedBloom."""
        pairs = append_log_pairs(self._log_dir(self.prefix), df, cols)
        if len(pairs):
            self.pairs = (
                np.concatenate([self.pairs, pairs])
                if len(self.pairs) else pairs
            )
            self._refresh_cache()

    def fold_if_due(self, index: DataFrame | None, key: list[str],
                    target_fpp: float, rebuild_bar: float,
                    force: bool = False) -> None:
        if not force and len(self.pairs) < FOLD_KEYS:
            return
        grew = self._grow_if_needed(index, key, target_fpp, rebuild_bar,
                                    extra_keys=0)
        if len(self.pairs):
            shard = _shard_of_np(self.pairs[:, 0], self.n_shards)
            for s in range(self.n_shards):
                rows = shard == s
                if not rows.any():
                    continue
                sc = BloomSidecar.load(self.shards[s].path)
                sc.add_hashes(self.pairs[rows, 0], self.pairs[rows, 1])
                sc.save(self.shards[s].path)
                self.shards[s] = _read_meta(self.shards[s].path)
        elif not grew:
            return  # nothing to write
        self._write_manifest_and_clear_log()

    # --- internals ---

    def _grow_if_needed(self, index: DataFrame | None, key: list[str],
                        target_fpp: float, rebuild_bar: float,
                        extra_keys: int) -> bool:
        if self.projected_fpp(extra_keys) <= rebuild_bar:
            return False
        if self.shards[0].n_bits >= size_for(10**12):
            return False  # per-shard cap: saturated-but-correct
        per_shard = max(
            1, int(1.25 * (self.n_keys() + extra_keys)) // self.n_shards
        )
        nbits = size_for(per_shard, fpp=target_fpp)
        if nbits <= self.shards[0].n_bits:
            return False
        self.shards = _rebuild_shards(
            index, key, self.n_shards, nbits, self.prefix,
            np.empty((0, 2), dtype=np.int64),
        )
        return True

    def _write_manifest_and_clear_log(self) -> None:
        sd = self._shards_dir(self.prefix)
        os.makedirs(sd, exist_ok=True)
        manifest = os.path.join(sd, MANIFEST)
        tmp = manifest + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"version": SHARDS_VERSION, "n_shards": self.n_shards}, fh
            )
        os.replace(tmp, manifest)
        ld = self._log_dir(self.prefix)
        if os.path.isdir(ld):
            for name in os.listdir(ld):
                if name.endswith(".npy"):
                    os.remove(os.path.join(ld, name))
        self.pairs = np.empty((0, 2), dtype=np.int64)
        self._refresh_cache()


def _collect_shard_parts(df: DataFrame, cols: list[str], n_shards: int,
                         nbits: int) -> dict[int, list[bytes]]:
    """One distributed scan per SHARD GROUP → per-(partition, shard)
    zlib-compressed bitmaps + counts, grouped by shard for
    one-at-a-time finalize. Sparse partition maps compress ~100×, so
    driver traffic stays O(partitions × shards-present), never O(rows)
    or shards × cap.

    Hash sharding makes every task touch every shard, so a task that
    accumulated ALL shards would allocate n_shards × nbits/8 locally —
    at the per-shard cap that is 16 × 1 GiB, double the 8 GiB
    REBUILD_TASK_BYTES contract (ADVICE r10). Shards are therefore
    processed in contiguous sub-groups sized so one task's bitmaps fit
    the budget; each group is a separate pass over the hashed keys
    (extra passes only engage near the cap, where correctness of the
    memory bound matters more than scan count)."""
    import zlib

    from meilisync_spark.functions.bloom import (
        REBUILD_TASK_BYTES,
        _positions,
    )

    hashed = df.select(*bloom_hash_cols(*[F.col(c) for c in cols]))
    shard_bytes = max(1, nbits // 8)
    group = min(n_shards, max(1, int(REBUILD_TASK_BYTES // shard_bytes)))
    if group < n_shards:
        hashed = hashed.persist()
    nb, ns = nbits, n_shards

    out: dict[int, list] = {}
    try:
        for lo in range(0, n_shards, group):
            hi = min(lo + group, n_shards)
            per_task = (hi - lo) * shard_bytes
            max_parts = max(2, int(REBUILD_TASK_BYTES // per_task))
            h = hashed
            if h.rdd.getNumPartitions() > max_parts:
                h = h.coalesce(max_parts)

            def _part(batches: Iterator, _lo=lo, _hi=hi) -> Iterator:
                import pandas as pd

                local: dict[int, np.ndarray] = {}
                counts: dict[int, int] = {}
                for pdf in batches:
                    h1 = pdf["_bh1"].to_numpy(dtype=np.int64)
                    h2 = pdf["_bh2"].to_numpy(dtype=np.int64)
                    if not len(h1):
                        continue
                    u1 = h1.view(np.uint64)
                    shard = (u1 % np.uint64(ns)).astype(np.int64)
                    keep = (shard >= _lo) & (shard < _hi)
                    if not keep.any():
                        continue
                    u1, h2, shard = u1[keep], h2[keep], shard[keep]
                    for s in np.unique(shard):
                        rows = shard == s
                        bits = local.setdefault(
                            int(s), np.zeros(nb // 8, dtype=np.uint8)
                        )
                        pos = _positions(
                            u1[rows], h2[rows].view(np.uint64), nb,
                            K_HASHES,
                        ).ravel()
                        np.bitwise_or.at(
                            bits, (pos >> np.uint64(3)).astype(np.int64),
                            (np.uint8(1)
                             << (pos & np.uint64(7)).astype(np.uint8)),
                        )
                        counts[int(s)] = counts.get(int(s), 0) + int(
                            rows.sum()
                        )
                if local:
                    yield pd.DataFrame(
                        {
                            "s": list(local),
                            "bm": [zlib.compress(local[s].tobytes(), 1)
                                   for s in local],
                            "n": [counts[s] for s in local],
                        }
                    )

            for row in h.mapInPandas(
                _part, "s int, bm binary, n long"
            ).collect():
                out.setdefault(row["s"], []).append((row["bm"], row["n"]))
    finally:
        if group < n_shards:
            hashed.unpersist()
    return out


def _or_parts_into(sc: BloomSidecar, parts: list) -> None:
    import zlib

    for bm, n in parts:
        sc.bits |= np.frombuffer(zlib.decompress(bm), dtype=np.uint8)
        sc.n_added += n


def _rebuild_shards(index: DataFrame | None, cols: list[str],
                    n_shards: int, nbits: int, prefix: str,
                    extra_pairs: np.ndarray) -> list[_ShardMeta]:
    """Rebuild every shard right-sized from the index (plus raw log
    pairs), finalizing ONE shard bitmap in driver memory at a time."""
    parts = (
        _collect_shard_parts(index, cols, n_shards, nbits)
        if index is not None else {}
    )
    pair_shards = (
        _shard_of_np(extra_pairs[:, 0], n_shards)
        if len(extra_pairs) else None
    )
    os.makedirs(ShardedBloom._shards_dir(prefix), exist_ok=True)
    metas = []
    for s in range(n_shards):
        sc = BloomSidecar(n_bits=nbits)
        _or_parts_into(sc, parts.get(s, []))
        if pair_shards is not None and (pair_shards == s).any():
            rows = pair_shards == s
            sc.add_hashes(extra_pairs[rows, 0], extra_pairs[rows, 1])
        path = ShardedBloom._shard_path(prefix, s)
        sc.save(path)
        metas.append(_read_meta(path))
    return metas
