"""Exact k-means: the Spark implementation must match an independent
single-machine numpy replication bit-for-bit (the fixed-point design
makes that a hard equality, not a tolerance check)."""

from __future__ import annotations

import duckdb
import numpy as np

from meilisync_spark.operators.kmeans import ITERS_DEFAULT, K_DEFAULT, KM_QUANT, kmeans_labels
from meilisync_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _numpy_reference(X: np.ndarray, vec_ids: np.ndarray, k: int, iters: int):
    Xq = np.floor(X * KM_QUANT).astype(np.int64)
    order = np.argsort(vec_ids)
    seeds = order[np.isin(vec_ids[order], np.arange(k))]
    centq = Xq[seeds]
    for _ in range(iters):
        d = ((Xq[:, None, :] - centq[None, :, :]) ** 2).sum(axis=2)
        cl = d.argmin(axis=1)
        new = centq.copy()
        for c in range(k):
            sel = Xq[cl == c]
            if len(sel):
                new[c] = sel.sum(axis=0) // len(sel)
        centq = new
    d = ((Xq[:, None, :] - centq[None, :, :]) ** 2).sum(axis=2)
    return dict(zip(vec_ids.tolist(), d.argmin(axis=1).tolist()))


def test_kmeans_matches_numpy_reference(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    got = {r.vec_id: r.cluster for r in kmeans_labels(emb).collect()}

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM '{SF_SMOKE}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    vec_ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    expected = _numpy_reference(X, vec_ids, K_DEFAULT, ITERS_DEFAULT)

    assert got == expected


def test_kmeans_deterministic_across_runs_and_partitionings(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = {r.vec_id: r.cluster for r in kmeans_labels(emb).collect()}
    b = {r.vec_id: r.cluster for r in kmeans_labels(emb.repartition(7)).collect()}
    assert a == b
    assert len(a) == emb.count()
    assert set(a.values()) <= set(range(K_DEFAULT))


def test_kmeans_driver_and_distributed_trainers_bit_identical(spark):
    """The round-12 driver fast path (whole corpus under
    TRAIN_DRIVER_CAP_ROWS collected once, Lloyd loop in-process) must
    equal the distributed partial-sum trainer EXACTLY — the int64
    fixed-point design leaves no summation-order freedom. Passing
    seed_rows pins the distributed path (the caller-decided over-cap
    form), so both trainers stay exercised."""
    from meilisync_spark.operators.kmeans import (
        collect_corpus_under_cap,
        kmeans_centroids,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    seed = (
        emb.where(f"vec_id < {K_DEFAULT}").select("vec_id", "embedding").collect()
    )
    dist = kmeans_centroids(emb, seed_rows=seed)  # distributed trainer
    drv = kmeans_centroids(emb)  # driver fast path (smoke corpus < cap)
    assert (dist == drv).all()
    # the over-cap probe is bounded and degrades to None, never raises
    assert collect_corpus_under_cap(emb, cap=3) is None
    assert collect_corpus_under_cap(emb, cap=0) is None


def test_ann_ivf_kmeans_probe(spark):
    """The kmeans-trained IVF probe returns ≤k cell-restricted
    neighbors per query, every neighbor shares the query's cell, and
    ranking matches brute-force order within the cell."""
    from pyspark.sql import functions as F

    from meilisync_spark.operators.similarity import TOP_K, ann_ivf_kmeans
    from meilisync_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = ann_ivf_kmeans(emb).collect()
    assert out, "probe returned nothing"
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    for q_id, rows in by_q.items():
        assert len(rows) <= TOP_K
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        cosines = [r.cosine for r in sorted(rows, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)
        assert len({r.cluster for r in rows}) == 1  # all from the query's cell


def test_trained_ivf_recall_on_clustered_twin(spark):
    """The full IVF story closed on data with real cluster structure:
    k-means (seeded from vec_id<k — one seed lands in each twin cell)
    discovers the cells, and the trained-cell probe recovers the
    brute-force top-k. Local-only like the rest of the k-means loop
    (iterative ⇒ non-SQL-expressible), but the recall is measured, not
    asserted by construction."""
    from meilisync_spark.operators.similarity import (
        N_QUERIES,
        _recall_against_brute,
        ann_ivf_kmeans,
        clustered_embeddings,
    )
    from meilisync_spark.sources.parquet import load_table
    from tests.conftest import SF_SMOKE

    ce = clustered_embeddings(load_table(spark, SF_SMOKE, "embeddings"))
    from meilisync_spark.operators.similarity import TOP_K

    rows = _recall_against_brute(ce, ann_ivf_kmeans(ce), TOP_K).collect()
    assert len(rows) == N_QUERIES
    mean = sum(r.recall for r in rows) / len(rows)
    assert mean >= 0.8, mean
