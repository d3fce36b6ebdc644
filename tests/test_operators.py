"""Unit tests for the core CDC operators with hand-built micro-fixtures —
the reference's assert-exact-documents style (SURVEY.md §5), hermetic."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from meilisync_spark.operators.apply import apply_changes
from meilisync_spark.operators.compaction import compact_last_wins
from meilisync_spark.operators.project import apply_fields, normalize_types, snapshot_sync
from meilisync_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def test_normalize_types_epoch(spark):
    # the reference's golden value: TIMESTAMP '1977-01-27 22:00:53' → 223250453
    # (meilisync/schemas.py:21-22, tests/test_mysql.py:30)
    df = spark.createDataFrame(
        [Row(id=1, age=46, time=datetime.datetime(1977, 1, 27, 22, 0, 53))]
    )
    out = normalize_types(df).collect()[0]
    assert out.time == 223250453
    assert out.id == 1 and out.age == 46


def test_normalize_types_date_to_iso(spark):
    df = spark.createDataFrame([Row(id=1, d=datetime.date(2024, 2, 29))])
    out = normalize_types(df).collect()[0]
    assert out.d == "2024-02-29"  # meilisync/schemas.py:23-24


def test_apply_fields_rename_and_fallback(spark):
    df = spark.createDataFrame([Row(a=1, b=2)])
    assert apply_fields(df, {"a": "x", "b": None}).columns == ["x", "b"]
    # quirk Q5 (meilisync/schemas.py:30): empty map keeps the full row
    assert apply_fields(df, None).columns == ["a", "b"]


def test_compaction_last_wins_keeps_null_payload(spark):
    # T9: dropDuplicates would keep the FIRST row; last-wins must keep the
    # latest even when its payload is NULL (sparse update).
    df = spark.createDataFrame(
        [
            Row(pk=1, seq=1, op="create", value=10.0),
            Row(pk=1, seq=2, op="update", value=None),
            Row(pk=2, seq=3, op="create", value=7.0),
        ]
    )
    out = {r.pk: r for r in compact_last_wins(df, ["pk"], "seq").collect()}
    assert out[1].op == "update" and out[1].value is None
    assert out[2].value == 7.0


def test_apply_changes_semantics(spark):
    base = spark.createDataFrame(
        [Row(pk=1, value=10.0, k=1), Row(pk=2, value=20.0, k=2), Row(pk=3, value=30.0, k=3)]
    )
    changes = spark.createDataFrame(
        [
            # partial update: NULL value keeps base's 10.0, k overwritten
            Row(pk=1, seq=1, op="update", value=None, k=100),
            # delete drops pk 2
            Row(pk=2, seq=2, op="delete", value=None, k=None),
            # create fully replaces pk 3 (NULL k replaces 3 — add_documents
            # replaces the whole doc, meilisync/meili.py:128-131)
            Row(pk=3, seq=3, op="create", value=99.0, k=None),
            # upsert of a brand-new pk via update (meili update_documents
            # creates missing docs)
            Row(pk=4, seq=4, op="update", value=4.0, k=4),
            # compaction: create then delete within the batch → never lands
            Row(pk=5, seq=5, op="create", value=5.0, k=5),
            Row(pk=5, seq=6, op="delete", value=None, k=None),
        ]
    )
    out = {r.pk: r for r in apply_changes(base, changes, pk="pk").collect()}
    assert set(out) == {1, 3, 4}
    assert out[1].value == 10.0 and out[1].k == 100
    assert out[3].value == 99.0 and out[3].k is None
    assert out[4].value == 4.0 and out[4].k == 4


def test_snapshot_sync_pushdown(spark):
    # column pruning must reach the parquet scan: ReadSchema only carries
    # the projected fields
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    out = snapshot_sync(df, {"l_orderkey": "id", "l_shipdate": None})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "l_extendedprice" not in plan


def test_approx_distinct_error_bound(spark):
    """approx_user_counts is rows-only for the driver (HLL sketches are
    engine-specific); assert the ±5% accuracy contract locally."""
    from meilisync_spark import queries as Q

    rows = Q.REGISTRY["approx_user_counts"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n")
        ).collect()
    }
    assert len(rows) == len(exact)
    for r in rows:
        e = exact[r.event_type]
        assert abs(r.approx_users - e) <= max(1, 0.05 * e), (r.event_type, r.approx_users, e)


def test_connected_components_chain_and_islands(spark):
    """Min-label propagation must cross multi-hop chains (diameter > 1)
    — the case the corpus's shallow dup clusters don't exercise."""
    from meilisync_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    # chain 1-2-3-4-5 (diameter 4), pair 7-8, singletons 6, 9, 10
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 7)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(nodes, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 7, 8: 7, 9: 9, 10: 10}


def test_connected_components_max_iters_boundary(spark):
    """Round-12 internals change (single-shuffle union-form step with
    the changed-count riding the checkpoint as an Observation): pin
    the convergence-cap contract. A component of diameter EXACTLY
    max_iters is labeled by the last allowed round and must be
    reported converged via the settling probe; one round fewer must
    raise instead of returning split clusters."""
    import pytest

    from meilisync_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    # chain 1-2-3-4-5-6: diameter 5 (label 1 reaches node 6 in round 5)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(nodes, pairs, max_iters=5).collect()
    }
    assert got == {i: 1 for i in range(1, 7)}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, pairs, max_iters=4).collect()


def test_cc_driver_and_distributed_identical(spark, monkeypatch):
    """Round-13 internals change (in-process propagation under
    CC_DRIVER_CAP_PAIRS, the kmeans collect-under-cap pattern): the
    driver and distributed loops must produce IDENTICAL labels and the
    IDENTICAL convergence verdict round for round — including the
    diameter==max_iters settling-probe case and the over-cap raise."""
    import pytest

    from meilisync_spark.operators import dedup as D

    nodes = spark.createDataFrame([(i,) for i in range(1, 12)], "doc_id long")
    # chain 1..6 (diameter 5), triangle 7-8-9, singleton 10, 11
    pairs_rows = [(i, i + 1) for i in range(1, 6)] + [(7, 8), (8, 9), (9, 7)]
    pairs = spark.createDataFrame(pairs_rows, "doc_a long, doc_b long")

    def run(max_iters):
        return {
            r.doc_id: r.cluster_id
            for r in D.connected_components(nodes, pairs, max_iters).collect()
        }

    want = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 7, 8: 7, 9: 7, 10: 10, 11: 11}
    got_driver = run(5)
    # force the distributed path by dropping the cap below the pair count
    monkeypatch.setattr(D, "CC_DRIVER_CAP_PAIRS", 2)
    got_dist = run(5)
    assert got_driver == got_dist == want
    # settling-probe boundary and the non-convergence raise, both paths
    with pytest.raises(RuntimeError, match="did not converge"):
        run(4)
    monkeypatch.setattr(D, "CC_DRIVER_CAP_PAIRS", 1 << 21)
    assert run(5) == want
    with pytest.raises(RuntimeError, match="did not converge"):
        run(4)


def test_connected_components_empty_pairs(spark):
    """Round-12 internals change (round 1 fused into an edge
    aggregation; isolated nodes anti-join the final labels): an EMPTY
    pair set must converge in the first round (observed changed=0 over
    zero rows) and label every node as its own singleton cluster."""
    from meilisync_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id for r in connected_components(nodes, pairs).collect()}
    assert got == {i: i for i in range(1, 6)}


def test_approx_percentile_error_bound(spark):
    """approx_price_quantiles is rows-only for the driver (GK sketches
    are engine-specific); assert the rank-error contract vs the exact
    per-group sort locally."""
    from meilisync_spark import queries as Q

    approx = {r.l_returnflag: r for r in
              Q.REGISTRY["approx_price_quantiles"].fn(spark, SF_SMOKE).collect()}
    li = load_table(spark, SF_SMOKE, "lineitem")
    groups = {r.l_returnflag: sorted(x[0] for x in r.vals)
              for r in li.groupBy("l_returnflag")
              .agg(F.collect_list(F.struct("l_extendedprice")).alias("vals"))
              .collect()}
    assert set(approx) == set(groups)
    for flag, row in approx.items():
        vals = groups[flag]
        n = len(vals)
        for col, frac in [("p25", .25), ("p50", .5), ("p75", .75), ("p95", .95)]:
            got = getattr(row, col)
            # rank of the returned value must be within 1% of target
            import bisect
            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got)
            target = frac * (n - 1)
            assert lo - 0.01 * n <= target <= hi + 0.01 * n, (flag, col, got)


def test_clustered_recall_demonstrates_ann_paths(spark):
    """VERDICT r2 item 5: the raw fixture is near-orthogonal, so the
    honest recall rows sit ~0.1 — these twins must prove the probe
    shapes actually FIND neighbors when structure exists. Threshold
    0.8; measured 1.0 for both probes on the deterministic clustered
    twin corpus (and the brute-force ground truth is recomputed on the
    same twin, so the comparison is apples-to-apples)."""
    from meilisync_spark.operators import similarity as S

    emb = load_table(spark, SF_SMOKE, "embeddings")
    for fn in (S.ann_recall_clustered, S.srp_recall_clustered):
        rows = fn(emb).collect()
        assert len(rows) == S.N_QUERIES
        mean = sum(r.recall for r in rows) / len(rows)
        assert mean >= 0.8, (fn.__name__, mean)
    # and the clustered twin is well-formed: unit count preserved,
    # cells balanced by construction
    ce = S.clustered_embeddings(emb)
    assert ce.count() == emb.count()
    per_cell = {r.label: r.n for r in
                ce.groupBy("label").agg(F.count("*").alias("n")).collect()}
    assert len(per_cell) == S.CLUSTER_CELLS


def test_multiprobe_lifts_srp_recall(spark):
    """Multi-probe must strictly beat single-probe SRP recall on the
    raw fixture (the knob's whole point) while probing (1+bits)/2^bits
    of the corpus."""
    from meilisync_spark.operators import similarity as S

    emb = load_table(spark, SF_SMOKE, "embeddings")
    single = sum(r.recall for r in S.srp_recall_at_k(emb).collect()) / S.N_QUERIES
    multi = sum(r.recall for r in S.srp_multiprobe_recall(emb).collect()) / S.N_QUERIES
    assert multi > single
    assert multi >= 0.3  # measured 0.45 at sf0.01/sf0.001 fixtures
