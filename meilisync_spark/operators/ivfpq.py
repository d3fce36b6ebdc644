"""IVF+PQ — the composition billion-scale ANN actually ships
(FAISS ``IVFPQ``; here the ``by_residual=False`` variant that encodes
raw vectors): the trained k-means coarse quantizer
(operators/kmeans.py) prunes the scan to the query's cell(s), and
product quantization (operators/pq.py) compresses what that scan
reads. The two knobs multiply: probing 1 of ``kcells`` cells over
8-byte codes instead of 256-byte floats is a ~``kcells·32``× IO
reduction per query versus the brute-force float scan, and the exact
re-rank stage restores precision on the |Q|·shortlist survivors.

Index shape persisted at 100 TB: ``(vec_id, cluster, codes)``
partitioned by ``cluster`` — the probe is then a partition-pruned scan
of code columns only (the layout contract
``test_cell_partitioned_corpus_prunes_ann_probe`` pins for the cell
dimension). Training (both quantizers) is sample-or-corpus passes with
partial-sum shuffles; everything per-query is broadcast closures.

Iterative training ⇒ rows-only (no SQL oracle); recall is measured on
the clustered twin corpus in tests/test_pq.py, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from meilisync_spark.operators.pq import (
    N_QUERIES,
    _quantize,
    _split,
    pq_codebooks,
    pq_encode,
)

IVFPQ_SHORTLIST = 64


def ivfpq_index(emb: DataFrame):
    """Train both quantizers and build the compressed index frame
    ``(vec_id, cluster, codes)`` — the thing you'd write out
    partitioned by ``cluster``. Returns (index_df, books)."""
    from meilisync_spark.operators.kmeans import kmeans_labels

    books = pq_codebooks(emb)
    cells = kmeans_labels(emb)
    idx = pq_encode(emb, books).join(cells, "vec_id")
    return idx, books


def ivfpq_topk(
    emb: DataFrame, k: int = 5, shortlist: int = IVFPQ_SHORTLIST
) -> DataFrame:
    """(q_id, neighbor_id, rank, cosine) — the full two-quantizer
    probe: restrict to the query's coarse cell, ADC-score the 8-byte
    codes, keep a ``shortlist``, exact-re-rank those ids against the
    full vectors. Query cell assignments come from the trained
    quantizer itself (the queries are corpus members here; a foreign
    query would take nearest-centroid assignment, same math as the
    labeler's final pass)."""
    import numpy as np

    from meilisync_spark.functions.vectors import cosine

    idx, books = ivfpq_index(emb)
    m = books.shape[0]

    q_rows = sorted(
        emb.where(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    Qs = _split(_quantize([r.embedding for r in q_rows]), m)
    tables = np.stack(
        [((Qs[s][:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2) for s in range(m)],
        axis=1,
    )  # (|Q|, m, ksub)

    q_cells = idx.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("cluster").alias("q_cluster")
    )
    # cell prune: only the probed cells' code rows are scored. At rest
    # this is a partition-pruned scan of the cluster-partitioned index.
    probed = idx.join(
        F.broadcast(q_cells), idx.cluster == q_cells.q_cluster
    ).select("q_id", "vec_id", "codes")

    def score(batches, _tables=tables, _q_ids=q_ids):
        import numpy as _np
        import pandas as _pd

        qpos = {int(q): i for i, q in enumerate(_q_ids)}
        for pdf in batches:
            C = _np.array(list(pdf["codes"]), dtype=_np.int64)
            qs = pdf["q_id"].to_numpy()
            ids = pdf["vec_id"].to_numpy()
            d = _np.zeros(len(ids), dtype=_np.int64)
            for s in range(C.shape[1]):
                # per-row gather against that row's own query table
                d += _tables[[qpos[int(q)] for q in qs], s, C[:, s]]
            yield _pd.DataFrame(
                {"q_id": qs, "neighbor_id": ids, "adc_dist": d}
            )

    scored = probed.mapInPandas(
        score, schema="q_id long, neighbor_id long, adc_dist long"
    ).where(F.col("neighbor_id") != F.col("q_id"))
    wsl = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    sl = (
        scored.withColumn("r", F.row_number().over(wsl))
        .where(F.col("r") <= shortlist)
        .select("q_id", "neighbor_id")
    )

    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cand = sl.join(F.broadcast(q), "q_id")
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    rer = c.join(F.broadcast(cand), "neighbor_id").withColumn(
        "cosine", cosine(F.col("q_emb"), F.col("c_emb"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "cosine")
    )


def ivfpq_recall_clustered(emb: DataFrame, k: int = 5) -> DataFrame:
    """(q_id, n_hits, n_brute, recall) — the composed probe measured
    against brute force on the clustered twin: cell prune × 32× code
    compression × exact re-rank, recall 1.0 (threshold-asserted)."""
    from meilisync_spark.operators.similarity import (
        _recall_against_brute,
        clustered_embeddings,
    )

    ce = clustered_embeddings(emb)
    return _recall_against_brute(ce, ivfpq_topk(ce, k), k)
