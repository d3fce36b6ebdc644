"""Iterative k-means over the embedding corpus — the offline training
loop that fills the IVF coarse quantizer's cell ids
(operators/similarity.py:ann_ivf_label probes those cells).

Exactness design: floats are quantized once to fixed point
(``floor(x·2^20)`` — int64), and every distance / mean is exact integer
arithmetic from then on. That makes the whole loop deterministic across
runs, partitionings, batch heights and engines — no BLAS
summation-order noise, no argmin flapping on last-ulp ties (ties break
to the lowest cluster id). The driver loop is the standard k-means
shape: centroids are k×dim ints (tiny — they ride in the UDF closure,
the broadcast pattern), while the corpus only ever streams.

Scale shape per iteration: ONE pass over the corpus; the assign UDF
emits per-batch partial sums (k rows per Arrow batch — map-side
combine), so the shuffle carries |batches|×k tiny rows, never vectors.
Iterative algorithms are exactly where a driver loop is idiomatic
Spark (MLlib's own KMeans does the same); the per-iteration plan is
still fully declarative.

Non-SQL-expressible (iterative) ⇒ rows-only for the driver's oracle;
tests replicate the algorithm independently in numpy and compare
assignments exactly (tests/test_kmeans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KM_QUANT = 1 << 20  # fixed-point quantum: floor(x * 2^20)
K_DEFAULT = 10
ITERS_DEFAULT = 3

# Driver fast path: when the whole corpus fits under this row cap, the
# Lloyd loop runs in-process over ONE bounded collect instead of one
# Spark job per iteration — the FAISS shape (quantizers train in memory
# over a bounded corpus/sample; only encode/assign streams). Exact
# int64 fixed-point arithmetic has no summation-order freedom, so the
# two paths are bit-identical (equality pinned in tests/test_kmeans.py
# and tests/test_pq.py). Above the cap the distributed partial-sum
# trainer runs unchanged — the cap raises the driver-memory question
# loudly instead of hiding it, same policy as bpe.BPE_MAX_VOCAB_WORDS.
TRAIN_DRIVER_CAP_ROWS = 65536
_DRIVER_CHUNK = 8192  # bounds the chunk×k×dim distance intermediate


def collect_corpus_under_cap(emb: DataFrame, cap: int | None = None):
    """The trainers' bounded fast-path collect: ``(vec_id, embedding)``
    rows when the corpus has at most ``cap`` rows, else None. ONE
    CollectLimit job either way — scanning stops at cap+1 rows, so the
    over-cap probe cost is bounded by the cap, never by the corpus."""
    cap = TRAIN_DRIVER_CAP_ROWS if cap is None else cap
    if cap <= 0:
        return None
    rows = emb.select("vec_id", "embedding").limit(cap + 1).collect()
    return rows if len(rows) <= cap else None


def _argmin_chunked(Xq, centq, chunk: int = _DRIVER_CHUNK):
    """Exact int64 nearest-centroid assignment, chunked so the
    (chunk, k, dim) difference tensor stays bounded — same math and the
    same lowest-index tie-break as the per-batch UDF form."""
    import numpy as np

    out = np.empty(Xq.shape[0], dtype=np.int64)
    for i in range(0, Xq.shape[0], chunk):
        d = ((Xq[i : i + chunk, None, :] - centq[None, :, :]) ** 2).sum(axis=2)
        out[i : i + chunk] = d.argmin(axis=1)
    return out


def _kmeans_driver(corpus_rows, k: int, iters: int):
    """In-process Lloyd loop over a collected corpus — bit-identical to
    the distributed trainer: int64 sums are order-free, floor division
    keeps the lattice, empty clusters keep their previous centroid."""
    import numpy as np

    centq = _seed_centroids(None, k, seed_rows=corpus_rows)
    Xq = np.floor(
        np.array([r.embedding for r in corpus_rows], dtype=np.float64) * KM_QUANT
    ).astype(np.int64)
    for _ in range(iters):
        cl = _argmin_chunked(Xq, centq)
        sums = np.zeros((centq.shape[0], Xq.shape[1]), dtype=np.int64)
        np.add.at(sums, cl, Xq)
        cnt = np.bincount(cl, minlength=centq.shape[0])
        new = centq.copy()
        for c in np.nonzero(cnt)[0]:
            new[c] = sums[c] // cnt[c]
        centq = new
    return centq


def _seed_centroids(emb: DataFrame, k: int, seed_rows=None):
    import numpy as np

    rows = sorted(
        (
            (r for r in seed_rows if r.vec_id < k)
            if seed_rows is not None
            else emb.where(F.col("vec_id") < k)
            .select("vec_id", "embedding")
            .collect()
        ),
        key=lambda r: r.vec_id,
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    return np.floor(X * KM_QUANT).astype(np.int64)


def _assign_fn(centq, emit_partials: bool):
    """Batch fn: exact int64 distances to every centroid, argmin with
    lowest-id tie-break. Emits either per-batch partial sums (training)
    or per-vector assignments (final labeling)."""

    # KM_QUANT bound as a default: a module-global reference would make
    # cloudpickle serialize it by module lookup, requiring
    # meilisync_spark importable on the python WORKER — false whenever
    # the driver launched outside the repo (session._ship_package is
    # the belt; this is the suspenders)
    def run(batches, _q=KM_QUANT):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            X = _np.array(list(pdf["embedding"]), dtype=_np.float64)
            Xq = _np.floor(X * _q).astype(_np.int64)
            # |x-c|^2 exactly, batch×k — int64 throughout
            d = ((Xq[:, None, :] - centq[None, :, :]) ** 2).sum(axis=2)
            cl = d.argmin(axis=1)  # numpy argmin: first (lowest) index on ties
            if not emit_partials:
                yield _pd.DataFrame(
                    {"vec_id": pdf["vec_id"].to_numpy(), "cluster": cl.astype("int32")}
                )
                continue
            # vectorized per-cluster partial sums: one scatter-add over
            # the batch instead of one boolean-mask pass per cluster
            # (k masks × batch scans) — exact int64 either way
            k = centq.shape[0]
            sums = _np.zeros((k, Xq.shape[1]), dtype=_np.int64)
            _np.add.at(sums, cl, Xq)
            cnt = _np.bincount(cl, minlength=k)
            rows = [
                (int(c), int(cnt[c]), sums[c].tolist())
                for c in _np.nonzero(cnt)[0]
            ]
            yield _pd.DataFrame(rows, columns=["cluster", "n", "sums"])

    return run


def kmeans_centroids(
    emb: DataFrame, k: int = K_DEFAULT, iters: int = ITERS_DEFAULT,
    seed_rows=None, corpus_rows=None,
):
    """Train and return the centroid matrix on the fixed-point lattice
    (``(k, dim)`` int64) — the coarse-quantizer half an index persists
    so FOREIGN query vectors can be assigned to cells at serve time
    (operators/ivfpq.save_index stores it as index metadata).
    ``seed_rows``: pre-collected rows covering ``vec_id < k`` (see
    pq.pq_codebooks — one shared seed collect for both quantizers);
    passing them pins the DISTRIBUTED trainer (the caller already
    decided the corpus is over the driver cap). ``corpus_rows``: the
    ENTIRE collected corpus — takes the in-process driver loop. With
    neither, the corpus is probed against TRAIN_DRIVER_CAP_ROWS and
    the faster applicable path is taken; both paths are bit-identical
    (exact int64 — tests/test_kmeans.py)."""
    import numpy as np

    if corpus_rows is None and seed_rows is None:
        corpus_rows = collect_corpus_under_cap(emb)
    if corpus_rows is not None:
        return _kmeans_driver(corpus_rows, k, iters)
    centq = _seed_centroids(emb, k, seed_rows=seed_rows)
    corpus = emb.select("vec_id", "embedding")
    dim = centq.shape[1]
    for _ in range(iters):
        partials = corpus.mapInPandas(
            _assign_fn(centq, emit_partials=True),
            schema="cluster int, n long, sums array<long>",
        )
        # ONE action per Lloyd iteration: carry n through the
        # posexplode so counts and per-component sums come back from
        # the same (cluster, pos) groupBy — sum(n) at any one pos IS
        # the cluster count (each partial row contributes its n once
        # per component). Exact int64, identical values to the old
        # two-collect form, which re-ran the corpus assign pass TWICE
        # per iteration (guide §1.2: don't compute things twice) and
        # paid two scheduler round-trips. (A wide dim×sum() single agg
        # was measured SLOWER than this narrow shape — 2.8 vs 1.2 s at
        # sf0.1 — so the explode stays.)
        comp = (
            partials.select("cluster", "n", F.posexplode("sums").alias("pos", "s"))
            .groupBy("cluster", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("cn"))
            .collect()
        )
        new = centq.copy()  # empty clusters keep their previous centroid
        sums: dict = {}
        counts: dict = {}
        for r in comp:
            sums.setdefault(r.cluster, np.zeros(dim, dtype=np.int64))[r.pos] = r.s
            if r.pos == 0:
                counts[r.cluster] = r.cn
        for c, vec in sums.items():
            # floor-divide keeps centroids on the fixed-point lattice
            new[c] = vec // counts[c]
        centq = new
    return centq


def assign_cells(emb: DataFrame, centq) -> DataFrame:
    """(vec_id, cluster) — nearest-centroid assignment against a
    trained (or loaded) centroid matrix; the labeler's final pass,
    reusable at serve time for vectors the trainer never saw."""
    return emb.select("vec_id", "embedding").mapInPandas(
        _assign_fn(centq, emit_partials=False), schema="vec_id long, cluster int"
    )


def kmeans_labels(
    emb: DataFrame, k: int = K_DEFAULT, iters: int = ITERS_DEFAULT
) -> DataFrame:
    """(vec_id, cluster) after ``iters`` exact Lloyd iterations seeded
    from the first ``k`` vectors."""
    return assign_cells(emb, kmeans_centroids(emb, k, iters))
