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

from meilisync_spark.pin import SER as _SER
from meilisync_spark.operators.pq import (
    N_QUERIES,
    _quantize,
    _split,
    pq_codebooks,
    pq_encode,
)

IVFPQ_SHORTLIST = 64

# The at-rest index layout is fixed by ANN_INDEX_FORMAT_VERSION, so
# readers supply the schema instead of paying a footer-inference job
# per open (round 13: one "parquet at" job removed from every probe,
# dedup-probe and stats read; a layout change bumps the version and
# this schema together).
INDEX_SCHEMA = "vec_id long, codes array<int>, cluster int"


def _read_index(spark, index_path: str) -> DataFrame:
    return spark.read.schema(INDEX_SCHEMA).parquet(index_path)


def _adc_scored(
    probed: DataFrame, tables, q_ids, *, exclude_self: bool = True,
    carry_rank: bool = False,
) -> DataFrame:
    """ADC-score a ``(q_id, vec_id, codes)`` frame against per-query
    distance tables (numpy, broadcast in the closure): one Arrow batch
    pass, the per-batch query-gather index hoisted out of the
    per-subspace loop.

    ``exclude_self`` drops rows where ``neighbor_id == q_id`` — correct
    only when the query ids ARE corpus vec_ids (the benchmark rows);
    the serving path disables it for foreign query batches whose
    caller-chosen ids would otherwise silently mask the corpus vector
    sharing the number.

    ``carry_rank`` passes an int ``cell_rank`` input column through to
    the output — the fused nprobe-curve probe tags every candidate with
    its cell's probe rank so one scoring pass serves several nprobe
    settings (see :func:`ann_nprobe_recall`)."""
    import numpy as np  # noqa: F401 — tables is a numpy array in the closure

    def score(batches, _tables=tables, _q_ids=q_ids, _carry=carry_rank):
        import numpy as _np
        import pandas as _pd

        qpos = {int(q): i for i, q in enumerate(_q_ids)}
        for pdf in batches:
            C = _np.array(list(pdf["codes"]), dtype=_np.int64)
            qs = pdf["q_id"].to_numpy()
            ids = pdf["vec_id"].to_numpy()
            qidx = _np.array([qpos[int(q)] for q in qs], dtype=_np.int64)
            d = _np.zeros(len(ids), dtype=_np.int64)
            for s in range(C.shape[1]):
                d += _tables[qidx, s, C[:, s]]
            out = {"q_id": qs, "neighbor_id": ids, "adc_dist": d}
            if _carry:
                out["cell_rank"] = pdf["cell_rank"].to_numpy()
            yield _pd.DataFrame(out)

    schema = "q_id long, neighbor_id long, adc_dist long"
    if carry_rank:
        schema += ", cell_rank int"
    out = probed.mapInPandas(score, schema=schema)
    return out.where(F.col("neighbor_id") != F.col("q_id")) if exclude_self else out


def _encode_assign(emb: DataFrame, books, centq) -> DataFrame:
    """``(vec_id, codes, cluster)`` in ONE corpus pass: PQ-encode and
    nearest-centroid cell assignment fused into a single mapInPandas
    (both quantizers ride in the closure). Per-row math is identical to
    ``pq_encode`` + ``kmeans.assign_cells``; what disappears is the
    former ``join(..., "vec_id")`` between the two passes — a corpus-
    wide exchange of BOTH mapInPandas outputs that existed only to
    reunite columns computed from the same row (guide §2.4: remove
    shuffles outright). At 10⁹ vectors that join was two full-corpus
    shuffles; now the only exchange left in index building is the
    cluster-repartition the partitioned write genuinely needs."""
    from meilisync_spark.operators.pq import _worker_helpers

    m = books.shape[0]
    _qz, _sp = _worker_helpers()

    def run(batches, _books=books, _centq=centq, _sp=_sp, _qz=_qz, _m=m):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            Xq = _qz(list(pdf["embedding"]))
            Xs = _sp(Xq, _m)
            codes = []
            for s in range(_m):
                d = ((Xs[s][:, None, :] - _books[s][None, :, :]) ** 2).sum(axis=2)
                codes.append(d.argmin(axis=1))
            dc = ((Xq[:, None, :] - _centq[None, :, :]) ** 2).sum(axis=2)
            cl = dc.argmin(axis=1)  # lowest index on ties, same as training
            yield _pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    # C-level transpose+tolist beats a per-row python
                    # int loop; identical (n, m) int lists
                    "codes": _np.stack(codes, axis=1).tolist(),
                    "cluster": cl.astype("int32"),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        run, schema="vec_id long, codes array<int>, cluster int"
    )


def ivfpq_index(
    emb: DataFrame, *, with_centroids: bool = False, kcells: int | None = None
):
    """Train both quantizers and build the compressed index frame
    ``(vec_id, cluster, codes)`` — the thing you'd write out
    partitioned by ``cluster``. Returns (index_df, books), plus the
    coarse centroid matrix when ``with_centroids`` (the query-side
    half :func:`save_index` persists). ``emb`` is pinned first: both
    trainings iterate corpus passes over it. ``kcells`` overrides the
    coarse quantizer's cell count (more cells ⇒ finer pruning, lower
    per-cell recall at nprobe=1 — the knob :func:`ann_nprobe_recall`
    measures).

    Under kmeans.TRAIN_DRIVER_CAP_ROWS the corpus is collected ONCE
    (materializing the pin) and both quantizers train in-process over
    it — bit-identical exact-int64 math, zero per-iteration Spark jobs,
    the FAISS split (quantizers in memory, encode streams). Over the
    cap, the two trainings are INDEPENDENT given the pinned corpus, so
    they run on two driver threads (guide §2.6 — actions are
    sequential only because driver code calls them sequentially): each
    training is a chain of small per-iteration jobs, and overlapping
    the chains hides one behind the other; both trainers seed from a
    deterministic vec_id prefix via ONE shared collect."""
    from pyspark import inheritable_thread_target
    from threading import Thread

    from meilisync_spark.operators.kmeans import (
        K_DEFAULT,
        collect_corpus_under_cap,
        kmeans_centroids,
    )
    from meilisync_spark.operators.pq import PQ_KSUB

    emb = emb.localCheckpoint(False, storageLevel=_SER)
    k_coarse = kcells or K_DEFAULT
    # ONE bounded collect (which also materializes the pin): under the
    # driver cap it IS the training corpus — both quantizers then train
    # in-process (bit-identical int64 math, zero further training jobs)
    # and only encode+assign streams, the FAISS split. Over the cap it
    # degrades to the seed prefix and the distributed threaded trainers.
    corpus_rows = collect_corpus_under_cap(emb)
    if corpus_rows is not None:
        books = pq_codebooks(emb, corpus_rows=corpus_rows)
        centq = kmeans_centroids(emb, k=k_coarse, corpus_rows=corpus_rows)
    else:
        result: dict = {}
        errors: list = []

        def _run(key, fn):
            try:
                result[key] = fn()
            except BaseException as e:  # re-raised on the caller thread
                errors.append(e)

        seed_rows = (
            emb.where(F.col("vec_id") < max(PQ_KSUB, k_coarse))
            .select("vec_id", "embedding")
            .collect()
        )
        threads = [
            Thread(target=inheritable_thread_target(lambda k=k, f=f: _run(k, f)),
                   daemon=True)
            for k, f in (
                ("books", lambda: pq_codebooks(emb, seed_rows=seed_rows)),
                ("centq", lambda: kmeans_centroids(
                    emb, k=k_coarse, seed_rows=seed_rows)),
            )
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise errors[0]
        books, centq = result["books"], result["centq"]
    idx = _encode_assign(emb, books, centq)
    return (idx, books, centq) if with_centroids else (idx, books)


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
    # pin the codes: the probe plan consumes idx TWICE (q_cells below
    # and the candidate join) and Spark does not share duplicated
    # subtrees, so unpinned the encode+assign pass would run twice —
    # at any corpus size the codes frame is the 32×-compressed corpus,
    # exactly what one materializes once
    idx = idx.localCheckpoint(True, storageLevel=_SER)
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
    scored = _adc_scored(probed, tables, q_ids)
    wsl = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    sl = (
        scored.withColumn("r", F.row_number().over(wsl))
        .where(F.col("r") <= shortlist)
        .select("q_id", "neighbor_id")
    )
    # NOT rewritten onto the driver re-rank (round 13, measured): this
    # frame is returned LAZY and its consumer (ivfpq_recall_clustered)
    # overlaps the brute subtree with these stages inside one job — the
    # eager _refine_driver form measured 1.18× (interleaved min-of-2).
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


def _residual_frame(emb: DataFrame, cells: DataFrame, centroids) -> DataFrame:
    """(vec_id, embedding=residual, cluster) — x minus its cell centroid
    (float domain; the PQ trainer re-quantizes). Centroids ride as a
    literal array-of-arrays in the plan, zip_with per row, no shuffle
    beyond the cell-assignment join."""
    cents = F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in centroids])
    withc = emb.join(cells, "vec_id")
    res = F.zip_with(
        F.col("embedding"),
        F.element_at(cents, F.col("cluster") + 1),
        lambda x, c: x.cast("double") - c,
    )
    return withc.select("vec_id", res.alias("embedding"), "cluster")


def _cell_adc_topk(frame: DataFrame, cells: DataFrame, books, k: int) -> DataFrame:
    """Cell-restricted ADC top-k over a (vec_id, embedding) frame whose
    vectors are what the PQ codes encode (raw or residual): candidates
    come only from the query's own cell — the probe shape residual
    codes REQUIRE, since a residual is meaningless outside its cell."""
    import numpy as np

    m = books.shape[0]
    q_rows = sorted(
        frame.where(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    Qs = _split(_quantize([r.embedding for r in q_rows]), m)
    tables = np.stack(
        [((Qs[s][:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2) for s in range(m)],
        axis=1,
    )
    # pinned for the same duplicated-subtree reason as ivfpq_topk: the
    # plan below consumes idx twice (q_cells + the candidate join)
    idx = pq_encode(frame, books).join(cells, "vec_id").localCheckpoint(
        True, storageLevel=_SER
    )
    q_cells = idx.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("cluster").alias("q_cluster")
    )
    probed = idx.join(F.broadcast(q_cells), idx.cluster == q_cells.q_cluster).select(
        "q_id", "vec_id", "codes"
    )
    scored = _adc_scored(probed, tables, q_ids)
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id")
    )


def ivfpq_residual_adc_recall(emb: DataFrame, k: int = 5):
    """(variant, mean_recall) for raw-vector vs residual PQ codes under
    the SAME cell-restricted ADC probe (no re-rank) on the clustered
    twin — the measured case for FAISS's default ``by_residual=True``:
    with tight cells, raw-vector PQ assigns every cell member the same
    codes (ADC ties broken arbitrarily — measured 0.275 at m=16), while
    encoding ``x − centroid(cell)`` spends the whole code budget on
    within-cell detail (measured 0.625, 2.3× at identical probe and
    byte budget; the residual noise is genuinely random, so 4-bit
    codebooks cap it there — re-rank closes the rest). The restriction
    to the probed cell is not incidental: a residual is meaningless
    outside its own cell (measured corpus-wide residual ADC collapses
    to ~0.08 — WORSE than raw), which is why IVF and residual-PQ only
    exist as a pair."""
    import numpy as np

    from meilisync_spark.operators.kmeans import KM_QUANT, kmeans_labels
    from meilisync_spark.operators.similarity import (
        _pinned_brute_async,
        _recall_against_brute,
        clustered_embeddings,
    )

    # pin the twin: every Lloyd pass of both quantizer trainings (and
    # the brute-force recall denominator) re-reads this frame — without
    # the pin each of those jobs replays the scan+map lineage
    ce = clustered_embeddings(emb).localCheckpoint(False, storageLevel=_SER)
    # pin the assignments too: cells is consumed by the centroid stats,
    # the residual frame, and BOTH variants' probes (twice each — the
    # probe plan joins it for q_cells and for the candidate set), and
    # every one of those replays the assign mapInPandas pass unpinned
    cells = kmeans_labels(ce).localCheckpoint(True, storageLevel=_SER)
    # ground truth depends only on ce (materialized by the training
    # actions above) — start it NOW on a driver thread so its corpus
    # pass overlaps the centroid stats and both variants' PQ trainings
    # instead of running back to back before the threads fork
    get_brute = _pinned_brute_async(ce, k)

    # cell centroids on the k-means fixed-point lattice, exact means
    stats = (
        ce.join(cells, "vec_id")
        .select("cluster", F.posexplode("embedding").alias("i", "x"))
        .groupBy("cluster", "i")
        .agg(
            F.sum(F.floor(F.col("x") * F.lit(float(KM_QUANT))).cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    kcells = max(r.cluster for r in stats) + 1
    dim = max(r.i for r in stats) + 1
    cents = np.zeros((kcells, dim))
    for r in stats:
        cents[r.cluster, r.i] = (r.s // r.n) / KM_QUANT

    from meilisync_spark.operators.pq import pq_codebooks

    spark = emb.sparkSession
    # pin the residual frame too: its lineage carries the cell join,
    # replayed by every PQ training pass otherwise
    residual = (
        _residual_frame(ce, cells, cents)
        .select("vec_id", "embedding")
        .localCheckpoint(False, storageLevel=_SER)
    )
    # Both variants (train m=16 books → cell-restricted ADC probe →
    # recall) score in ONE union action (round 13; previously two
    # driver threads each running its own recall agg action): the
    # trainings are in-process under the driver cap, each variant's
    # encode rides its _cell_adc_topk checkpoint, and the final union
    # collect overlaps both probe subtrees inside one job. m=16
    # (4-dim subspaces): double the code budget to 16 bytes so the
    # comparison isolates WHAT is encoded from quantizer resolution —
    # raw codes still collapse per cell at any budget. ADC ranks come
    # from the variant's own encoding under the cell-restricted probe;
    # ground truth stays exact cosine on the ORIGINAL twin vectors.
    # Hybrid schedule (round 13, both alternatives measured): the BUILD
    # half of each variant (train m=16 books, encode + eager codes
    # checkpoint, query collects inside _cell_adc_topk) still runs on a
    # driver thread — serializing those jobs measured 1.33× — but the
    # two recall scorings now ride ONE union collect instead of two
    # separate agg actions, so the final probe subtrees overlap inside
    # a single job.
    from threading import Thread

    from pyspark import inheritable_thread_target

    built: dict = {}
    errors: list = []

    def _build_variant(name: str, frame):
        try:
            # m=16 (4-dim subspaces): double the code budget to 16
            # bytes so the comparison isolates WHAT is encoded from
            # quantizer resolution — raw codes still collapse per cell
            # at any budget
            books = pq_codebooks(frame, m=16)
            # ADC ranks come from the variant's own encoding under the
            # cell-restricted probe; ground truth stays exact cosine on
            # the ORIGINAL twin vectors
            built[name] = _cell_adc_topk(frame, cells, books, k)
        except BaseException as e:  # re-raised on the caller thread
            errors.append(e)

    threads = [
        Thread(target=inheritable_thread_target(
            lambda n=n, f=f: _build_variant(n, f)), daemon=True)
        for n, f in (("raw", ce), ("residual", residual))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]
    brute = get_brute()
    per_variant = [
        _recall_against_brute(ce, built[name], k, brute=brute).agg(
            F.lit(name).alias("variant"),
            F.avg("recall").alias("mean_recall"),
        )
        for name in ("raw", "residual")
    ]
    union = per_variant[0].unionByName(per_variant[1])
    got = {r.variant: float(r.mean_recall) for r in union.collect()}
    rows = [(n, got[n]) for n in ("raw", "residual")]
    return spark.createDataFrame(rows, "variant string, mean_recall double")


def ivfpq_recall_clustered(emb: DataFrame, k: int = 5) -> DataFrame:
    """(q_id, n_hits, n_brute, recall) — the composed probe measured
    against brute force on the clustered twin: cell prune × 32× code
    compression × exact re-rank, recall 1.0 (threshold-asserted)."""
    from meilisync_spark.operators.similarity import (
        _recall_against_brute,
        clustered_embeddings,
    )

    # pin the twin: every Lloyd pass of both quantizer trainings (and
    # the brute-force recall denominator) re-reads this frame — without
    # the pin each of those jobs replays the scan+map lineage
    ce = clustered_embeddings(emb).localCheckpoint(False, storageLevel=_SER)
    # brute NOT threaded (round 12, measured): it rides the returned
    # lazy plan, where its stages already overlap the probe stages in
    # the final job — an eager pin + threaded brute measured 1.12×
    return _recall_against_brute(ce, ivfpq_topk(ce, k), k)


# ---------------------------------------------------------------------------
# The index AT REST: cluster-partitioned parquet, probed with static
# partition pruning — the layout a 100-TB deployment actually serves
# queries from (the in-plan ivfpq_topk trains+probes in one lineage;
# this is the write → read-back → prune → probe → re-rank lifecycle).
# ---------------------------------------------------------------------------


def ivfpq_persist_index(emb: DataFrame, index_path: str):
    """Train both quantizers and write the ``(vec_id, codes)`` frame
    hive-partitioned by ``cluster`` — the at-rest layout whose probe is
    a partition-pruned scan of code columns only. Returns the PQ
    codebooks (the query-side half of the index; at scale these few KB
    ship alongside the table as metadata)."""
    idx, books = ivfpq_index(emb)
    # cluster rows by the partition key first: one file per cluster=
    # directory instead of one per (write task, directory) — fewer
    # footer opens on every pruned read-back (same amplification as
    # the append path, see add_to_index)
    (
        idx.repartition(F.col("cluster"))
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(index_path)
    )
    return books


def _pruned_probe(idx: DataFrame, q_cells: list) -> DataFrame:
    """(q_id, vec_id, codes) — restrict the persisted index scan to the
    probed cells with a STATIC ``cluster IN (...)`` predicate (consumed
    by partition pruning — PartitionFilters in the plan, zero IO for
    every other cell), then attach each query id to its cell's rows via
    a broadcast join. ``q_cells`` is the collected (q_id, cluster) list
    — |Q| rows, already driver-side because the query vectors are."""
    spark = idx.sparkSession
    clusters = sorted({int(c) for _, c in q_cells})
    cells_df = spark.createDataFrame(q_cells, "q_id long, q_cluster int")
    return (
        idx.where(F.col("cluster").isin(clusters))
        .join(F.broadcast(cells_df), F.col("cluster") == F.col("q_cluster"))
        .select("q_id", "vec_id", "codes")
    )


def ivfpq_persisted_topk(
    spark, emb: DataFrame, index_path: str, k: int = 5,
    shortlist: int = IVFPQ_SHORTLIST, books=None,
) -> DataFrame:
    """(q_id, neighbor_id, rank, cosine) — the full at-rest lifecycle:
    :func:`ivfpq_persist_index` writes the cluster-partitioned index,
    the probe reads it back pruned to the queries' cells
    (:func:`_pruned_probe`), ADC-scores the 8-byte codes, keeps a
    ``shortlist``, and exact-re-ranks those ids against the full
    vectors. Identical math to :func:`ivfpq_topk`; what changes is
    that the probe's input is the persisted layout, so the plan carries
    the PartitionFilters a serving cluster depends on
    (tests/test_plans.py::test_ivfpq_persisted_probe_prunes_partitions).

    ``books``: pass the PQ codebooks of an ALREADY-persisted index at
    ``index_path`` to skip the train+write half and run only the
    read-back probe (the train-once cache path of
    :func:`ivfpq_persisted_recall`)."""
    import numpy as np

    from meilisync_spark.functions.vectors import cosine

    if books is None:
        books = ivfpq_persist_index(emb, index_path)
    m = books.shape[0]
    idx = _read_index(spark, index_path)

    q_rows = sorted(
        emb.where(F.col("vec_id") < N_QUERIES).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    Qs = _split(_quantize([r.embedding for r in q_rows]), m)
    tables = np.stack(
        [((Qs[s][:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2) for s in range(m)],
        axis=1,
    )
    # the queries' cell assignments, read from the persisted index
    # itself (vec_id pushes down as a scan filter; |Q| rows collect)
    q_cells = [
        (int(r.vec_id), int(r.cluster))
        for r in idx.where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "cluster").collect()
    ]
    scored = _adc_scored(_pruned_probe(idx, q_cells), tables, q_ids)
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


PQ_BOOKS_FILE = "_pq_books.npy"


def ivfpq_persisted_recall(spark, emb: DataFrame, k: int = 5,
                           cache_dir: str | None = None) -> DataFrame:
    """(q_id, n_hits, n_brute, recall) — the persisted-index probe
    measured against brute force on the clustered twin (recall 1.0,
    threshold-asserted in tests/test_pq.py). The index lives in a temp
    dir for the harness; materialized before the dir is removed.

    ``cache_dir``: train-once reuse (VERDICT r11 #4) — the row's
    purpose is the write → read-back → prune → probe lifecycle, and
    the read-back half is what each invocation must exercise: the
    train+write half runs at most once per corpus fingerprint (the PQ
    codebooks persist beside the codes as ``_pq_books.npy``, written
    LAST as the completeness witness), while every invocation re-runs
    the pruned read-back probe and the brute-force ground truth."""
    import os
    import shutil
    import tempfile

    import numpy as np

    from meilisync_spark.operators.similarity import (
        _pinned_brute_async,
        _recall_against_brute,
        clustered_embeddings,
    )

    # pin the twin: every Lloyd pass of both quantizer trainings (and
    # the brute-force recall denominator) re-reads this frame — without
    # the pin each of those jobs replays the scan+map lineage
    ce = clustered_embeddings(emb).localCheckpoint(False, storageLevel=_SER)
    # ground truth is independent of the persisted index — its corpus
    # pass overlaps the whole train → write → read-back → probe chain
    # on a driver thread (guide §2.6). The lazy pin's first touch may
    # race between the brute thread and the trainer's seed collect
    # (both then compute the pin's one pass — overlapped, not serial);
    # an eager pre-materialization job measured slower (1.10×)
    get_brute = _pinned_brute_async(ce, k)
    work = None
    try:
        if cache_dir is not None:
            def _build(p):
                b = ivfpq_persist_index(ce, p)
                np.save(os.path.join(p, PQ_BOOKS_FILE), b)

            _cache_once(cache_dir, _build, done_file=PQ_BOOKS_FILE)
            books = np.load(os.path.join(cache_dir, PQ_BOOKS_FILE))
            topk = ivfpq_persisted_topk(spark, ce, cache_dir, k, books=books)
        else:
            work = tempfile.mkdtemp(prefix="mls_ivfpq_")
            topk = ivfpq_persisted_topk(spark, ce, f"{work}/index", k)
        out = _recall_against_brute(ce, topk, k, brute=get_brute())
        out = spark.createDataFrame(out.collect(), out.schema)  # pin
    finally:
        if work is not None:
            shutil.rmtree(work, ignore_errors=True)
    return out


# ---------------------------------------------------------------------------
# Servable index: codes + query-side metadata persisted together, so a
# separate process (the `ann-build` / `ann-query` CLI) can build once
# and serve queries — including vectors the trainer never saw — against
# the at-rest layout.
# ---------------------------------------------------------------------------

ANN_META_FILE = "_ann_meta.json"

# Bump whenever the on-disk index layout or the quantizer math changes:
# cached served indexes (ann_query_served) key on it, so stale indexes
# built by older code can never be silently served by newer code.
ANN_INDEX_FORMAT_VERSION = 1


def save_index(emb: DataFrame, index_path: str, *, kcells: int | None = None) -> None:
    """Train both quantizers and persist a SELF-CONTAINED servable
    index: the ``(vec_id, codes)`` frame hive-partitioned by
    ``cluster`` plus ``_ann_meta.json`` carrying the query-side halves
    — the PQ codebooks (ADC tables are built from them per query) and
    the coarse centroids (nearest-centroid assignment routes foreign
    query vectors to their probe cells, the same fixed-point math as
    training's assignment pass). Both are a few KB — the FAISS split
    between the inverted lists (big, on disk, partition-pruned) and the
    quantizer objects (tiny, in memory).

    The meta also records the per-cell row counts AT TRAIN TIME
    (``trained_cells``) — the baseline :func:`index_stats` compares
    against after :func:`add_to_index` appends, so a deployment can see
    per-cell drift and decide when :func:`retrain_due`."""
    import json
    import os

    from pyspark.sql import Observation

    idx, books, centq = ivfpq_index(emb, with_centroids=True, kcells=kcells)
    # per-cell counts ride the WRITE job as observed metrics (one
    # conditional count per possible cell — the coarse quantizer has
    # k_coarse of them by construction) instead of re-reading the
    # written index for a groupBy/count: same numbers, one corpus-sized
    # read-back job removed from every index build
    k_coarse = centq.shape[0]
    obs = Observation("trained_cells")
    counted = idx.observe(
        obs,
        *[
            F.sum(F.when(F.col("cluster") == c, 1).otherwise(0)).alias(f"c{c}")
            for c in range(k_coarse)
        ],
    )
    # one file per cluster= directory (see ivfpq_persist_index)
    (
        counted.repartition(F.col("cluster"))
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(index_path)
    )
    got = obs.get
    trained_cells = {
        str(c): int(got[f"c{c}"])
        for c in range(k_coarse)
        if got[f"c{c}"]  # absent cells stay absent, like the old groupBy
    }
    meta = {
        "books": books.tolist(),
        "centroids": centq.tolist(),
        "trained_cells": trained_cells,
    }
    with open(os.path.join(index_path, ANN_META_FILE), "w") as fh:
        json.dump(meta, fh)


def load_index_meta(index_path: str):
    """(books, centroids) as int64 numpy arrays from ``_ann_meta.json``."""
    import json
    import os

    import numpy as np

    with open(os.path.join(index_path, ANN_META_FILE)) as fh:
        meta = json.load(fh)
    return (
        np.array(meta["books"], dtype=np.int64),
        np.array(meta["centroids"], dtype=np.int64),
    )


def query_index(
    spark,
    index_path: str,
    queries,
    *,
    k: int = 5,
    nprobe: int = 1,
    shortlist: int = IVFPQ_SHORTLIST,
    refine: DataFrame | None = None,
    queries_are_corpus_ids: bool = True,
    idx: DataFrame | None = None,
) -> DataFrame:
    """(q_id, neighbor_id, rank, adc_dist) — serve a query batch
    against a :func:`save_index` layout.

    ``queries`` is a list of ``(q_id, vector)`` pairs (a query batch is
    driver-sized by definition). Each query routes to its ``nprobe``
    nearest coarse cells via the stored centroids; the scan is pruned
    to exactly those partitions (static ``cluster IN``,
    PartitionFilters — same contract as
    test_ivfpq_persisted_probe_prunes_partitions), ADC-scored against
    per-query tables built from the stored codebooks, and ranked.

    ``refine``: optionally pass the raw corpus ``(vec_id, embedding)``
    frame to exact-re-rank the ADC shortlist (FAISS's IndexRefineFlat
    split: raw vectors live beside, not inside, the code index); the
    output then carries exact ``cosine`` instead of ``adc_dist``.
    ``nprobe`` trades IO for recall exactly like FAISS's knob — at 1
    the probe reads 1/kcells of the codes.

    ``queries_are_corpus_ids``: when True (default — the ann-query CLI
    picks queries BY corpus vec_id), the query's own corpus row is
    excluded from its results; set False for foreign query vectors
    with caller-chosen ids, where an id coincidence must not mask the
    corpus vector sharing the number.

    ``idx``: pass an already-read index DataFrame to share one
    ``spark.read.parquet`` (file listing + schema read) across several
    probes of the same at-rest index (ann_nprobe_recall's three)."""
    import numpy as np

    books, centq = load_index_meta(index_path)
    m = books.shape[0]
    if not queries:
        raise ValueError("query_index needs a non-empty query batch")
    q_ids = np.array([int(q) for q, _ in queries], dtype=np.int64)
    if len(set(q_ids.tolist())) != len(q_ids):
        # _adc_scored keys distance tables by q_id: a duplicate would
        # silently score one vector's candidates with the other's table
        raise ValueError("duplicate q_id values in the query batch")
    Q = _quantize([v for _, v in queries])
    dim = centq.shape[1]
    if Q.shape[1] != dim:
        raise ValueError(
            f"query vectors have dim {Q.shape[1]}, index expects {dim}"
        )
    # route to cells: exact int64 distances on the training lattice
    d = ((Q[:, None, :] - centq[None, :, :]) ** 2).sum(axis=2)
    probe_cells = np.argsort(d, axis=1)[:, :nprobe]
    q_cells = [
        (int(q), int(c)) for q, row in zip(q_ids, probe_cells) for c in row
    ]
    Qs = _split(Q, m)
    tables = np.stack(
        [((Qs[s][:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2) for s in range(m)],
        axis=1,
    )
    if idx is None:
        idx = _read_index(spark, index_path)
    scored = _adc_scored(
        _pruned_probe(idx, q_cells), tables, q_ids,
        exclude_self=queries_are_corpus_ids,
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    ranked = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= (shortlist if refine is not None else k))
    )
    if refine is None:
        return ranked.select("q_id", "neighbor_id", "rank", "adc_dist")

    # An in-process exact re-rank of the (driver-sized) shortlist was
    # tried and REVERTED after measuring (round 13): collecting the
    # shortlist + fetching candidate vectors splits one lazy action
    # into three sequential ones, and the py4j/planning barrier between
    # actions costs more than the 4-6 AQE stage jobs it removes —
    # interleaved min-of-4 read 1.28×/1.14×/1.06× on
    # ann_query_served/ivfpq_persisted_recall/ann_incremental_recall
    # (values were bit-identical). Stages inside ONE action overlap and
    # schedule without driver round-trips; keep the lazy join form.
    from meilisync_spark.functions.vectors import cosine

    qdf = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in queries],
        "q_id long, q_emb array<double>",
    )
    cand = ranked.select("q_id", "neighbor_id").join(F.broadcast(qdf), "q_id")
    c = refine.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
    )
    rer = c.join(F.broadcast(cand), "neighbor_id").withColumn(
        "cosine", cosine(F.col("q_emb"), F.col("c_emb"))
    )
    wr = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rer.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "cosine")
    )


# ---------------------------------------------------------------------------
# Incremental maintenance: FAISS's add-after-train shape. The quantizers
# are trained once (save_index); new vectors stream in forever — each
# batch is assigned to its nearest STORED centroid, PQ-encoded with the
# STORED codebooks, and appended to the cluster= partitions. O(batch)
# work, same at-rest layout, zero retrain; index_stats / retrain_due
# turn quantizer staleness into a measurable, thresholded number.
# ---------------------------------------------------------------------------


def _load_meta_dict(index_path: str) -> dict:
    import json
    import os

    with open(os.path.join(index_path, ANN_META_FILE)) as fh:
        return json.load(fh)


def collapse_add_batch(emb: DataFrame, expect_dim: int | None = None) -> DataFrame:
    """Collapse exact-duplicate ``(vec_id, embedding)`` rows and raise
    on conflicts — the add-batch sanity gate, shared by
    :func:`add_to_index`, the streaming ingest and the pipeline CLI so
    a poison batch fails BEFORE anything (the raw-vector sidecar in
    particular) is appended.

    Duplicate vec_ids within one batch would both append (the replay
    anti-join only checks the stored index) and then shadow each other
    nondeterministically at query time. Two distinct cases:
    exact-duplicate ROWS (the at-least-once replay of a crash window —
    bit-identical, so a raise would wedge a checkpointed ``--follow``
    stream forever on the same batch) collapse silently; the same
    vec_id carrying DIFFERING embeddings is a caller data bug a replay
    never produces, and collapsing it would silently discard data —
    raise. Arrays are orderable in Spark, so min!=max detects a
    conflict exactly in the same single groupBy. The check is
    deterministic, so running it again inside :func:`add_to_index`
    after a caller already collapsed the batch is a cheap no-op shape.

    ``expect_dim``: also verify EVERY row's embedding dimension in the
    SAME validation job (round 12 — the former separate distinct-scan
    per :func:`add_to_index` batch folded in here; checking the
    collapsed row covers every raw row because same-vec_id rows with
    differing dims differ as arrays and raise as conflicts)."""
    agg = emb.groupBy("vec_id").agg(
        F.min("embedding").alias("embedding"),
        F.max("embedding").alias("_mx"),
    )
    checks = agg.select(
        "vec_id",
        (F.col("embedding") != F.col("_mx")).alias("conflict"),
        F.size("embedding").alias("d"),
    )
    cond = F.col("conflict")
    if expect_dim is not None:
        cond = cond | (F.col("d") != expect_dim)
    probs = checks.where(cond).limit(3).collect()
    bad = [int(r.vec_id) for r in probs if r.conflict]
    if bad:
        raise ValueError(
            f"vec_ids {bad} appear in one add batch with conflicting "
            "embeddings — refusing to pick one silently; dedupe the "
            "batch upstream (exact-duplicate replay rows are fine)"
        )
    if probs:  # conflict-free rows here can only be dim mismatches
        raise ValueError(
            f"new vectors have dim {probs[0].d}, index expects {expect_dim}"
        )
    return agg.drop("_mx")


def add_to_index(spark, index_path: str, emb: DataFrame, *, dedup: bool = True) -> int:
    """Append ``(vec_id, embedding)`` rows to a :func:`save_index`
    layout WITHOUT retraining — the FAISS ``add``-after-``train``
    lifecycle: nearest-STORED-centroid assignment routes each vector to
    its cell (the same fixed-point math as training's assignment pass),
    the STORED codebooks encode it, and the rows append into the
    ``cluster=`` partitions the probe already prunes on. Per-batch cost
    is O(batch) encode/assign plus, under ``dedup``, a vec_id anti-join
    pruned to the batch's own cells — assignment is deterministic, so
    an at-least-once replay of a batch lands in exactly the same cells,
    which makes the touched-partition check sufficient for idempotence.
    Returns the number of rows actually appended.

    The added vectors are served by :func:`query_index` immediately:
    the probe routes queries with the same stored centroids, so a new
    vector is found by any query probing its cell. What degrades over
    time is quantizer fit (cells drift, codebooks stop matching the
    data distribution) — watch :func:`index_stats` and rebuild with
    :func:`save_index` when :func:`retrain_due`."""
    from pyspark.sql import Observation

    books, centq = load_index_meta(index_path)
    expect_dim = int(centq.shape[1])
    # Validation rides the SAME job as the encode checkpoint (round 13;
    # previously a separate limit(3)-collect action per batch that ALSO
    # re-ran the collapse groupBy as the encode's lineage): the collapse
    # aggregation flags conflicts (same vec_id, differing embeddings —
    # min != max detects it exactly) and wrong dims, an Observation
    # below the guard filter counts them, and the driver raises the
    # same clean ValueErrors BEFORE anything is written. The filter
    # also keeps ragged rows out of the encode UDF's numpy stack, so
    # the failure is never a worker-side crash. (collapse_add_batch
    # stays as the standalone one-job validator for callers that
    # validate without encoding — streaming ingest, the pipeline CLI.)
    agg = emb.groupBy("vec_id").agg(
        F.min("embedding").alias("embedding"),
        F.max("embedding").alias("_mx"),
    )
    conflict = F.col("embedding") != F.col("_mx")
    okdim = F.size("embedding") == expect_dim
    obs_val = Observation()
    valid = (
        agg.observe(
            obs_val,
            F.sum(F.when(conflict, 1).otherwise(0)).alias("n_conflict"),
            F.slice(
                F.sort_array(F.collect_set(F.when(conflict, F.col("vec_id")))),
                1, 3,
            ).alias("conflict_ids"),
            F.sum(F.when(~conflict & ~okdim, 1).otherwise(0)).alias("n_baddim"),
            F.max(F.when(~okdim, F.size("embedding"))).alias("bad_dim"),
        )
        .where(conflict == F.lit(False))
        .where(okdim)
        .select("vec_id", "embedding")
    )
    # pin the encoded batch: the anti-join and the append would
    # otherwise each replay the encode pass (fused encode+assign — same
    # single-pass shape as index building). The batch row count and
    # the touched-cell set ride the SAME checkpoint job as observed
    # metrics (round 12) — previously a separate distinct-scan and a
    # separate count action over the pinned batch.
    obs_enc = Observation()
    new = (
        _encode_assign(valid, books, centq)
        .observe(
            obs_enc,
            F.count(F.lit(1)).alias("n"),
            F.collect_set("cluster").alias("cells"),
        )
        .localCheckpoint(True, storageLevel=_SER)
    )
    got_val = obs_val.get
    if int(got_val["n_conflict"] or 0):
        raise ValueError(
            f"vec_ids {[int(v) for v in got_val['conflict_ids']]} appear "
            "in one add batch with conflicting embeddings — refusing to "
            "pick one silently; dedupe the batch upstream "
            "(exact-duplicate replay rows are fine)"
        )
    if int(got_val["n_baddim"] or 0):
        raise ValueError(
            f"new vectors have dim {int(got_val['bad_dim'])}, "
            f"index expects {expect_dim}"
        )
    got = obs_enc.get
    n = int(got["n"])
    if not n:
        return 0
    if dedup:
        touched = sorted(int(c) for c in got["cells"])
        seen = _dedup_probe(spark, index_path, touched)
        obs_anti = Observation()
        new = (
            new.join(seen, F.col("vec_id") == F.col("seen_id"), "left_anti")
            .observe(obs_anti, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(True, storageLevel=_SER)
        )  # pin BEFORE the append: the anti-join
        # lineage reads the same directory the write appends into
        n = int(obs_anti.get["n"])
    if n:
        # cluster the rows by their partition key before the write so
        # each cluster= directory gets ONE new file per batch, not one
        # per (write task, directory) — the same small-files /
        # file-open amplification fixed on the corpus-ingest appends
        # (INGEST_STAGE_PROBE.json: the unclustered form spent 24 s of
        # a 40 s batch opening ~8k tiny files)
        (
            new.select("vec_id", "codes", "cluster")
            .repartition(F.col("cluster"))
            .write.mode("append")
            .partitionBy("cluster")
            .parquet(index_path)
        )
    return int(n)


def _dedup_probe(spark, index_path: str, touched: list) -> DataFrame:
    """The replay-dedup read: vec_ids of ONLY the batch's own cells —
    a partition-pruned, vec_id-only scan (PartitionFilters on
    ``cluster``, plan-asserted in
    tests/test_plans.py::test_add_to_index_dedup_probe_prunes), so the
    idempotence check costs O(touched cells), never O(index)."""
    return (
        _read_index(spark, index_path)
        .where(F.col("cluster").isin(touched))
        .select(F.col("vec_id").alias("seen_id"))
    )


def index_stats(spark, index_path: str) -> DataFrame:
    """(cluster, n_rows, trained_rows, added) per cell — the drift
    monitor for the add-after-train lifecycle: how much each inverted
    list has grown since its quantizers were trained. The scan reads
    only parquet row counts (column-pruned); the trained baseline comes
    from ``_ann_meta.json``. Indexes written before the baseline was
    recorded report trained_rows=0 (everything counts as added)."""
    meta = _load_meta_dict(index_path)
    trained = {int(c): int(n) for c, n in meta.get("trained_cells", {}).items()}
    counts = _read_index(spark, index_path).groupBy("cluster").count().collect()
    rows = []
    for r in counts:
        c, n = int(r.cluster), int(r["count"])
        t = trained.get(c, 0)
        rows.append((c, n, t, n - t))
    return spark.createDataFrame(
        sorted(rows), "cluster int, n_rows long, trained_rows long, added long"
    )


def vectors_sidecar_path(index_path: str) -> str:
    """The raw-vector store kept beside a served index
    (``<index>_vectors``): PQ codes are lossy, so retraining needs the
    original embeddings — a deployment either keeps them (this sidecar,
    the FAISS-with-raw-vectors layout) or re-reads its source of truth.
    The sidecar is a plain append parquet dir; it lives BESIDE the
    index symlink, so atomic index swaps never touch it."""
    return index_path.rstrip("/") + "_vectors"


def seed_index_vectors(emb: DataFrame, index_path: str) -> str:
    """Write the training corpus's raw vectors into the sidecar — call
    once after :func:`save_index` to make the index rebuildable (the
    streaming ingest appends every later batch there)."""
    path = vectors_sidecar_path(index_path)
    emb.select("vec_id", "embedding").write.mode("overwrite").parquet(path)
    return path


def read_index_vectors(spark, index_path: str) -> DataFrame:
    """The sidecar's current contents with at-least-once replay appends
    collapsed (a replayed batch re-appends bit-identical rows; vec_id
    is unique upstream — :func:`add_to_index` raises on conflicts)."""
    return (
        spark.read.parquet(vectors_sidecar_path(index_path))
        .dropDuplicates(["vec_id"])
    )


def rebuild_index(emb: DataFrame, index_path: str, *, kcells: int | None = None) -> None:
    """Retrain both quantizers on ``emb`` and atomically swap the
    served index to the fresh build — the drift answer for the
    add-after-train lifecycle. Same pattern as
    :func:`meilisync_spark.operators.refresh.refresh_data` (reference:
    the shadow-index swap, meilisync/meili.py:34-71): train into a
    versioned directory, repoint the ``index_path`` symlink via a
    single atomic rename — readers (and concurrent
    :func:`add_to_index` batches, which reload the meta per batch)
    resolve old-or-new, never a half-written index. A legacy
    real-directory index migrates to the symlink layout on its first
    rebuild."""
    import os
    import shutil
    import uuid

    from meilisync_spark.operators.refresh import _sweep_stale

    tag = uuid.uuid4().hex[:8]
    version = f"{index_path.rstrip('/')}_v-{tag}"
    prev = os.path.realpath(index_path) if os.path.islink(index_path) else None
    _sweep_stale(index_path, keep={prev} if prev else set())
    save_index(emb, version, kcells=kcells)
    if os.path.islink(index_path) or not os.path.exists(index_path):
        staged = f"{index_path.rstrip('/')}_lnk-{tag}"
        os.symlink(version, staged)
        os.rename(staged, index_path)
    else:
        old = f"{index_path.rstrip('/')}_old-{tag}"
        os.rename(index_path, old)
        os.symlink(version, index_path)
        shutil.rmtree(old, ignore_errors=True)
    if prev and os.path.realpath(index_path) != prev:
        shutil.rmtree(prev, ignore_errors=True)


def retrain_due(spark, index_path: str, *, max_growth: float = 0.5) -> bool:
    """True when the index has grown past ``max_growth`` of its trained
    size — the retrain trigger a serving deployment polls. Growth (not
    recall) is the proxy: added vectors are encoded with quantizers
    that never saw them, so fit decays with the added fraction."""
    tot = index_stats(spark, index_path).agg(
        F.sum("added").alias("a"), F.sum("trained_rows").alias("t")
    ).first()
    if tot is None or not tot.t:
        return True  # no recorded baseline: be loud, ask for a retrain
    return (tot.a or 0) / tot.t > max_growth


def ivfpq_incremental_recall(spark, emb: DataFrame, k: int = 5,
                             cache_dir: str | None = None) -> DataFrame:
    """(q_id, n_hits, n_brute, recall) — the add-after-train lifecycle
    PROVEN end to end: quantizers train on 3/4 of the clustered twin
    (:func:`save_index`), the held-out quarter streams in as two
    :func:`add_to_index` batches (no retrain), and :func:`query_index`
    serves the benchmark queries (stored-centroid routing + exact
    refine) — measured against brute force over the FULL corpus, so the
    added vectors must be both findable and able to find (recall 1.0 on
    the twin, threshold-asserted in tests/test_pq.py).

    ``cache_dir``: train-once reuse (VERDICT r11 #4) — what this row
    measures is the ADD-AFTER-TRAIN path, not the trainer, so the
    base-3/4 index builds at most once per corpus fingerprint and each
    invocation COPIES it into a private work dir before running the
    two adds + the query inside the clock (``add_to_index`` mutates the
    index, so the cached copy itself is never written to)."""
    import shutil
    import tempfile

    from meilisync_spark.operators.similarity import (
        _pinned_brute_async,
        _recall_against_brute,
        clustered_embeddings,
    )

    # pin the twin: quantizer training iterates passes over it
    ce = clustered_embeddings(emb).localCheckpoint(False, storageLevel=_SER)
    base = ce.where(F.col("vec_id") % 4 != 3)
    # the query batch depends only on ce — collect it FIRST (this also
    # materializes the lazy pin), then overlap the brute-force ground
    # truth with the whole train → add → add → query chain on a driver
    # thread (guide §2.6: brute reads the same pin and nothing else)
    queries = [
        (int(r.vec_id), list(r.embedding))
        for r in ce.where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    ]
    get_brute = _pinned_brute_async(ce, k)
    work = tempfile.mkdtemp(prefix="mls_ivfpq_incr_")
    try:
        path = f"{work}/index"
        if cache_dir is not None:
            _build_served_cache(base, cache_dir)
            shutil.copytree(cache_dir, path)
        else:
            save_index(base, path)
        # the held-out quarter arrives in two separate batches
        for m in (3, 7):
            add_to_index(
                spark, path, ce.where(F.col("vec_id") % 8 == m), dedup=True
            )
        topk = query_index(spark, path, queries, k=k, refine=ce)
        out = _recall_against_brute(ce, topk, k, brute=get_brute())
        out = spark.createDataFrame(out.collect(), out.schema)  # pin
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def _cache_once(cache_dir: str, build_fn, done_file: str = ANN_META_FILE) -> None:
    """Run ``build_fn(path)`` into ``cache_dir`` exactly once: train
    into a private tmp sibling, then atomically rename into place —
    concurrent builders race safely (one rename wins, losers discard
    their copy), and a partially-written dir can never be mistaken for
    a finished artifact (``done_file`` is the completeness witness,
    written by ``build_fn`` as its last step or by ``save_index``)."""
    import os
    import shutil
    import tempfile

    if os.path.exists(os.path.join(cache_dir, done_file)):
        return
    parent = os.path.dirname(cache_dir) or "."
    tmp = tempfile.mkdtemp(prefix=os.path.basename(cache_dir) + ".tmp.", dir=parent)
    try:
        built = os.path.join(tmp, "built")
        build_fn(built)
        try:
            os.rename(built, cache_dir)
        except OSError:
            # a concurrent builder winning the rename is the only
            # benign cause — verify a finished artifact actually exists
            # before swallowing; an unrelated failure (permissions,
            # EXDEV) would otherwise surface later as a confusing
            # missing-path error inside query_index
            if not os.path.exists(os.path.join(cache_dir, done_file)):
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _build_served_cache(ce: DataFrame, cache_dir: str, *,
                        kcells: int | None = None) -> None:
    """Build :func:`save_index` output at ``cache_dir`` exactly once
    (atomic tmp-sibling rename — see :func:`_cache_once`)."""
    _cache_once(cache_dir, lambda p: save_index(ce, p, kcells=kcells))


def ann_query_served(spark, emb: DataFrame, cache_dir: str, k: int = 5) -> DataFrame:
    """(q_id, neighbor_id, rank, cosine) — the pure QUERY-side serving
    path: the index is built AT MOST ONCE per corpus fingerprint into
    ``cache_dir`` (train-once, like a real deployment — the
    ``ivfpq_persisted_recall`` row retrains per invocation by design,
    which conflates train and serve cost); the row itself only routes
    the benchmark queries through the stored centroids, scans the
    partition-pruned codes, ADC-ranks and exact-refines. Oracle:
    brute-force cosine top-k over the clustered twin — hash equality
    certifies the served probe found the TRUE top-k (serving recall
    1.0), not merely that k rows came back."""
    from meilisync_spark.operators.similarity import clustered_embeddings

    ce = clustered_embeddings(emb).localCheckpoint(False, storageLevel=_SER)
    _build_served_cache(ce, cache_dir)
    queries = [
        (int(r.vec_id), list(r.embedding))
        for r in ce.where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    ]
    return query_index(spark, cache_dir, queries, k=k, nprobe=1, refine=ce)


def ann_query_served_oracle_sql(k: int = 5) -> str:
    from meilisync_spark.functions.vectors import duck_cosine
    from meilisync_spark.operators.similarity import _clustered_cte

    return f"""
    WITH {_clustered_cte()},
    q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
    pairs AS (
        SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
               {duck_cosine('q.v', 'c.v')} AS cosine
        FROM q JOIN e c ON c.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT q_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, neighbor_id) AS rank
        FROM pairs
    )
    SELECT q_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= {k}
    """


def ann_nprobe_recall(spark, emb: DataFrame, k: int = 5,
                      cache_dir: str | None = None) -> DataFrame:
    """(nprobe, mean_recall) — the serving knob's recall-vs-IO curve
    pinned to numbers: the twin corpus is indexed with MORE coarse
    cells than it has natural clusters (kcells=20 vs 10), so tight
    clusters split across cells and nprobe=1 genuinely misses
    neighbors; probing 2 then 4 cells recovers them monotonically while
    reading 2×/4× the codes. Exact refine is ON (the production
    config), so the curve isolates what the PROBE failed to reach —
    precisely FAISS's nprobe trade.

    ``cache_dir``: train-once reuse (VERDICT r11 #4) — the row
    measures the PROBE's recall-vs-IO curve, not trainer cost, so the
    kcells=20 index builds at most once per corpus fingerprint (same
    atomic pattern as :func:`ann_query_served`); the three probes and
    the brute-force ground truth stay inside the clock. ``None`` keeps
    the build-per-invocation temp-dir form.

    Probe cost shape (round 12/13): the brute-force ground truth is ONE
    pinned |Q|×k frame shared by all three settings (it does not depend
    on nprobe), and the three settings probe NESTED cell sets — so the
    whole curve is ONE pruned scan of the nprobe=4 cells tagged with
    each cell's probe rank, one ADC pass, and three
    filter→shortlist→refine subtrees scored in a single union action
    (round 13; previously three threaded query_index trees re-reading
    1+2+4=7 cells where the union needs 4)."""
    import shutil
    import tempfile

    from meilisync_spark.operators.similarity import (
        _pinned_brute_async,
        _recall_against_brute,
        clustered_embeddings,
    )

    ce = clustered_embeddings(emb).localCheckpoint(False, storageLevel=_SER)
    # query batch first (depends only on ce; the collect materializes
    # the lazy pin), then the ground truth forks onto a driver thread
    # so its corpus pass overlaps the kcells=20 index build — it was
    # previously computed back to back between build and probes
    queries = [
        (int(r.vec_id), list(r.embedding))
        for r in ce.where(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    ]
    get_brute = _pinned_brute_async(ce, k)
    work = None
    try:
        if cache_dir is not None:
            path = cache_dir
            _build_served_cache(ce, path, kcells=20)
        else:
            work = tempfile.mkdtemp(prefix="mls_nprobe_")
            path = f"{work}/index"
            save_index(ce, path, kcells=20)
        brute = get_brute()
        # FUSED curve probe (round 13): the three nprobe settings probe
        # NESTED cell sets (cells@1 ⊂ cells@2 ⊂ cells@4) and a
        # candidate's ADC distance depends only on its codes — so one
        # pruned scan of the nprobe=4 cells, tagged with each cell's
        # probe rank, serves all three settings. Each variant filters
        # ``cell_rank <= n``, shortlists, exact-refines and scores
        # against the shared brute pin inside ONE union plan / ONE
        # action — previously three threaded query_index trees, each
        # with its own scan, python pass, windows and joins (and 3+2+1
        # = 6 cells of probe IO where the union needs 4).
        import numpy as np

        from meilisync_spark.functions.vectors import cosine

        nprobes = (1, 2, 4)
        books, centq = load_index_meta(path)
        m = books.shape[0]
        q_ids = np.array([int(q) for q, _ in queries], dtype=np.int64)
        Q = _quantize([v for _, v in queries])
        dists = ((Q[:, None, :] - centq[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(dists, axis=1)[:, : max(nprobes)]
        q_cells = [
            (int(q), int(c), r + 1)
            for q, row in zip(q_ids, order)
            for r, c in enumerate(row)
        ]
        Qs = _split(Q, m)
        tables = np.stack(
            [((Qs[s][:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
             for s in range(m)],
            axis=1,
        )
        idx = _read_index(spark, path)
        clusters = sorted({c for _, c, _ in q_cells})
        cells_df = spark.createDataFrame(
            q_cells, "q_id long, q_cluster int, cell_rank int"
        )
        probed = (
            idx.where(F.col("cluster").isin(clusters))
            .join(F.broadcast(cells_df), F.col("cluster") == F.col("q_cluster"))
            .select("q_id", "vec_id", "codes", "cell_rank")
        )
        # pin the scored candidates: the three variants consume this
        # subtree through their broadcast builds, and Spark does not
        # share duplicated subtrees — unpinned, each variant re-ran
        # the pruned scan + python scoring pass. ≤ |Q|·max(nprobe)
        # cells of (q_id, neighbor_id, adc_dist, cell_rank) rows.
        scored = _adc_scored(probed, tables, q_ids, carry_rank=True)\
            .localCheckpoint(True, storageLevel=_SER)
        qdf = spark.createDataFrame(
            [(int(q), [float(x) for x in v]) for q, v in queries],
            "q_id long, q_emb array<double>",
        )
        c = ce.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb")
        )
        per_n = []
        for n in nprobes:
            wsl = Window.partitionBy("q_id").orderBy(
                F.asc("adc_dist"), F.asc("neighbor_id")
            )
            sl = (
                scored.where(F.col("cell_rank") <= n)
                .withColumn("rank", F.row_number().over(wsl))
                .where(F.col("rank") <= IVFPQ_SHORTLIST)
                .select("q_id", "neighbor_id")
            )
            cand = sl.join(F.broadcast(qdf), "q_id")
            rer = c.join(F.broadcast(cand), "neighbor_id").withColumn(
                "cosine", cosine(F.col("q_emb"), F.col("c_emb"))
            )
            wr = Window.partitionBy("q_id").orderBy(
                F.desc("cosine"), F.asc("neighbor_id")
            )
            topk = (
                rer.withColumn("rank", F.row_number().over(wr))
                .where(F.col("rank") <= k)
                .select("q_id", "neighbor_id", "rank", "cosine")
            )
            per_n.append(
                _recall_against_brute(ce, topk, k, brute=brute).agg(
                    F.lit(n).alias("nprobe"),
                    F.avg("recall").alias("mean_recall"),
                )
            )
        union = per_n[0]
        for v in per_n[1:]:
            union = union.unionByName(v)
        rows = [(int(r.nprobe), float(r.mean_recall))
                for r in sorted(union.collect())]
    finally:
        if work is not None:
            shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, "nprobe int, mean_recall double")
