"""LSH mega-bucket guard — the round-6 headliner.

A band bucket with n members emits O(n²) candidate pairs from the band
self-join; AQE splits skewed shuffle PARTITIONS, not pair counts, so a
boilerplate-heavy corpus (10^4-10^5 docs sharing one template) would
detonate the join. The guard (operators/dedup.py::_cap_left_side)
collapses over-cap buckets to a representative STAR — O(n) pairs —
with the identical predicate mirrored in every DuckDB oracle; the
streaming probe (streaming/corpus_ingest.py::drop_near_dups) uses the
EXACT signature-collapse instead (semantics-preserving, pure join-size
reduction).

The 10_000-identical-docs test is the detonation fixture: without the
guard it would materialize ~8·10^8 join rows and effectively hang the
suite; with it, the star is 9_999 pairs.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from meilisync_spark.operators.dedup import (
    LSH_BUCKET_CAP,
    dedup_clusters,
    minhash_lsh_pairs,
    minhash_lsh_pairs_oracle_sql,
    simhash_neardup_pairs,
    simhash_neardup_pairs_oracle_sql,
)

TEMPLATE = (
    "free shipping on every order today click here to claim your "
    "exclusive discount before the offer expires tonight"
)

DISTINCT_DOCS = [
    "the migratory patterns of arctic terns span both hemispheres each year",
    "quantum error correction requires ancilla qubits and syndrome extraction",
    "sourdough fermentation depends on wild yeast and lactic acid bacteria",
]


def _drop_batch(spark, rows, schema, drop_dir, name):
    """Write one arrival batch as a FLAT parquet file in the drop dir.

    run_corpus_ingest infers schema with a non-recursive
    spark.read.parquet(docs_path), so the drop dir must hold plain
    part files, not nested dataset directories (the contract every
    ingest fixture follows — see tests/test_corpus_ingest.py)."""
    stage = os.path.join(drop_dir, f"_stage_{name}")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    os.rename(part, os.path.join(drop_dir, f"{name}.parquet"))


def _planted(spark, n_template: int, extra=()):
    rows = [(i, TEMPLATE) for i in range(n_template)]
    base = 1_000_000
    rows += [(base + j, t) for j, t in enumerate(DISTINCT_DOCS)]
    rows += list(extra)
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_mega_bucket_emits_star_not_quadratic(spark):
    """10k identical docs: every band bucket holds all 10k, far over
    the cap — the candidate set must be the star (rep=0, member) only:
    exactly n-1 pairs, every one at est_jaccard 1.0. Quadratic would be
    ~5·10^7 distinct pairs (and ~8·10^8 pre-distinct join rows)."""
    n = 10_000
    docs = _planted(spark, n)
    pairs = minhash_lsh_pairs(docs).localCheckpoint(True)
    template_pairs = pairs.where(F.col("doc_b") < 1_000_000)
    assert template_pairs.count() == n - 1
    assert template_pairs.where(F.col("doc_a") != 0).count() == 0
    assert template_pairs.where(F.col("est_jaccard") < 1.0).count() == 0
    # distinct docs collide with nothing
    assert pairs.where(F.col("doc_b") >= 1_000_000).count() == 0


def test_mega_bucket_clusters_stay_whole(spark):
    """The star is connectivity-preserving: all template docs still
    land in ONE cluster (id = min member), distinct docs self-label."""
    n = 2_000
    docs = _planted(spark, n)
    labels = {r.doc_id: r.cluster_id for r in dedup_clusters(docs).collect()}
    assert all(labels[i] == 0 for i in range(n))
    assert all(labels[1_000_000 + j] == 1_000_000 + j for j in range(3))


def test_guard_is_noop_below_cap(spark):
    """On a corpus whose largest bucket is under the cap the guard must
    change nothing: default cap vs effectively-uncapped give identical
    pair sets (the r5 fixture behavior is preserved bit-for-bit)."""
    docs = _planted(spark, 200)  # 200 < LSH_BUCKET_CAP
    assert 200 < LSH_BUCKET_CAP
    capped = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in minhash_lsh_pairs(docs).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in minhash_lsh_pairs(docs, bucket_cap=10**9).collect()
    }
    assert capped == uncapped
    assert len(capped) == 200 * 199 // 2  # identical docs: all pairs


def test_guard_matches_duckdb_oracle_when_triggered(spark):
    """The oracle mirrors the guard predicate verbatim — on a corpus
    that DOES trip the cap, Spark and DuckDB must still agree exactly
    (this is what keeps the driver rows green on any corpus, not just
    ones without mega-buckets)."""
    n = LSH_BUCKET_CAP + 60  # over the cap, small enough for duckdb
    docs = _planted(spark, n)
    got = {
        (r.doc_a, r.doc_b, round(r.est_jaccard, 9))
        for r in minhash_lsh_pairs(docs).collect()
    }
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = {
        (a, b, round(j, 9))
        for a, b, j in con.sql(minhash_lsh_pairs_oracle_sql()).fetchall()
    }
    con.close()
    assert got == exp
    # and it really did collapse: star only, n-1 template pairs
    assert len([p for p in got if p[1] < 1_000_000]) == n - 1


def test_streaming_probe_collapses_identical_sigs(spark, tmp_path):
    """The streaming near-dup probe's signature-collapse: an index
    holding 1_500 near-identical template variants (every signed doc's
    bands are recorded, dropped docs included — so a template flood
    GROWS the stored bucket) must still drop a new template variant and
    keep a distinct doc, via a probe whose corpus side is collapsed to
    ≤2 representatives per (bucket, sig)."""
    from meilisync_spark.streaming.corpus_ingest import run_corpus_ingest

    n = 1_500
    flood = [(i, TEMPLATE + f" variant{i}", "en", "crawl", 100) for i in range(n)]
    later = [
        (2_000_000, TEMPLATE + " variantfinal", "en", "crawl", 100),
        (2_000_001, DISTINCT_DOCS[0], "en", "crawl", 100),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars int"
    drop = tmp_path / "drop"
    drop.mkdir()
    _drop_batch(spark, flood, schema, str(drop), "batch1")
    index = str(tmp_path / "index")
    ck = str(tmp_path / "ck")
    run_corpus_ingest(
        spark, str(drop), index, ck, near_dedup=True, max_files_per_trigger=1
    )
    first = spark.read.parquet(index)
    # the flood collapses to one survivor (smallest id wins in-batch)
    assert first.count() == 1
    assert first.collect()[0].doc_id == 0
    # band index remembers EVERYTHING seen
    bands = spark.read.parquet(index + "_bands")
    assert bands.select("doc_id").distinct().count() == n

    _drop_batch(spark, later, schema, str(drop), "batch2")
    run_corpus_ingest(
        spark, str(drop), index, ck, near_dedup=True, max_files_per_trigger=1
    )
    kept = {r.doc_id for r in spark.read.parquet(index).select("doc_id").collect()}
    assert kept == {0, 2_000_001}  # template variant dropped, distinct kept


def test_incremental_probe_sig_collapse_is_exact(spark):
    """The incremental probe's corpus-side signature-collapse: with a
    corpus bucket far over the cap (a template flood) plus variant
    members, the per-delta-doc detection signal — max est_jaccard over
    reported pairs — must EQUAL the uncapped probe's (the collapse is a
    pure join-size reduction whenever distinct sigs per bucket ≤ cap;
    the old min-doc star only guaranteed the flood representative)."""
    from meilisync_spark.operators.dedup import incremental_neardup

    n = LSH_BUCKET_CAP + 200
    rows = [(i, TEMPLATE) for i in range(n)]
    # near-variants: same boilerplate, small suffix edits — these land
    # in (some of) the flood's band buckets with DIFFERENT signatures,
    # making the over-cap buckets genuinely multi-sig
    rows += [
        (700_000 + j, TEMPLATE + f" extra token {j}") for j in range(40)
    ]
    rows += [(900_000 + j, t) for j, t in enumerate(DISTINCT_DOCS)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def per_doc_signal(df):
        return {
            r.new_doc: round(r.mx, 9)
            for r in df.groupBy("new_doc")
            .agg(F.max("est_jaccard").alias("mx"))
            .collect()
        }

    guarded = per_doc_signal(incremental_neardup(docs))
    uncapped = per_doc_signal(incremental_neardup(docs, bucket_cap=10**9))
    assert guarded == uncapped
    assert guarded  # the hash-split delta side is non-empty


def test_cap_left_side_plan_broadcasts_guard(spark):
    """Plan contract: the guard join carries no forced broadcast hint
    (a pathological many-over-cap corpus must degrade to a shuffle
    join, not OOM the driver), but on a realistic corpus AQE's
    measured sizes still convert it to broadcast-hash at runtime — so
    the FINAL adaptive plan shows BroadcastHashJoin, and the pair plan
    stays cartesian-free."""
    docs = _planted(spark, 50)
    df = minhash_lsh_pairs(docs)
    df.collect()  # let AQE observe runtime sizes and finalize the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# SimHash mega-bucket guard (same failure mode as the LSH path: a
# template flood puts every copy in one (band_idx, band_val) bucket in
# all 4 bands — unguarded, the band self-join emits O(n²) rows)
# ---------------------------------------------------------------------------

def test_simhash_mega_bucket_emits_star_not_quadratic(spark):
    """10k identical docs: every band bucket holds all 10k, far over
    the cap — the pair set must be the star (rep=0, member): exactly
    n-1 pairs, every one at hamming 0."""
    n = 10_000
    docs = _planted(spark, n)
    pairs = simhash_neardup_pairs(docs).localCheckpoint(True)
    template_pairs = pairs.where(F.col("doc_b") < 1_000_000)
    assert template_pairs.count() == n - 1
    assert template_pairs.where(F.col("doc_a") != 0).count() == 0
    assert template_pairs.where(F.col("hamming") != 0).count() == 0
    # distinct docs collide with nothing at 15-bit bands
    assert pairs.where(F.col("doc_b") >= 1_000_000).count() == 0


def test_simhash_guard_is_noop_below_cap(spark):
    """Largest bucket under the cap ⇒ the guard changes nothing: all
    C(n,2) identical-doc pairs survive, capped == uncapped."""
    n = 200
    assert n < LSH_BUCKET_CAP
    docs = _planted(spark, n)
    capped = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_neardup_pairs(docs).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_neardup_pairs(docs, bucket_cap=10**9).collect()
    }
    assert capped == uncapped
    assert len(capped) == n * (n - 1) // 2


def test_simhash_guard_matches_duckdb_oracle_when_triggered(spark):
    """On a cap-tripping corpus the oracle (which mirrors the guard
    predicate) and Spark must agree exactly."""
    n = LSH_BUCKET_CAP + 60
    docs = _planted(spark, n)
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_neardup_pairs(docs).collect()
    }
    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    exp = set(map(tuple, con.sql(simhash_neardup_pairs_oracle_sql()).fetchall()))
    con.close()
    assert got == exp
    assert len([p for p in got if p[1] < 1_000_000]) == n - 1


def test_simhash_near_dup_lands_within_hamming_max(spark):
    """Semantic sanity at 60 bits: a long doc and a two-word edit of it
    still band-collide and verify within HAMMING_MAX (the repeated
    filler tokens give every bit a wide count margin, so the small edit
    moves few-to-no bits); an unrelated doc pairs with neither.
    (sha256 is deterministic, so the hamming value for this fixed
    fixture is stable — no flake.)"""
    base = " ".join(
        f"word{chr(97 + i % 23)} alpha beta gamma delta epsilon"
        for i in range(20)
    )
    edited = base.replace("worda ", "zebra ", 1).replace("wordb ", "walrus ", 1)
    docs = spark.createDataFrame(
        [(1, base), (2, edited), (3, DISTINCT_DOCS[0])],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_neardup_pairs(docs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 6
    assert all(3 not in k for k in pairs)
