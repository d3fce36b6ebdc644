"""Semantics checks for the corpus-selection operators (DSIR-shaped
importance weights, importance selection, token-budget curation) on
tiny hand-built inputs — independent of the DuckDB oracle (which runs
in test_oracle_parity), these pin the math against a plain Python
reimplementation and the selection invariants against construction."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from tests.conftest import SF_SMOKE

from meilisync_spark.operators.sampling import split_assign
from meilisync_spark.operators.selection import (
    DSIR_BUCKETS,
    budget_select,
    budget_select_scalable,
    cluster_safe_split,
    dsir_select,
    dsir_select_scalable,
    dsir_weights,
)


def _h64(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


def _feats(text: str) -> list[int]:
    w = re.findall("[a-z]+", text.lower())
    grams = w + [" ".join(w[i : i + 2]) for i in range(len(w) - 1)]
    return [_h64(g) % DSIR_BUCKETS for g in grams]


def _py_weights(docs: list[tuple[int, str, str]]) -> dict[int, tuple[int, int, int, float]]:
    feats = {d: _feats(t) for d, t, _ in docs}
    r_cnt: dict[int, int] = {}
    t_cnt: dict[int, int] = {}
    for d, _, lang in docs:
        for f in feats[d]:
            r_cnt[f] = r_cnt.get(f, 0) + 1
            if lang == "en":
                t_cnt[f] = t_cnt.get(f, 0) + 1
    t_tot = sum(t_cnt.values()) + DSIR_BUCKETS
    r_tot = sum(r_cnt.values()) + DSIR_BUCKETS
    out = {}
    for d, _, _lang in docs:
        if not feats[d]:
            continue
        t_mass = sum(t_cnt.get(f, 0) + 1 for f in feats[d])
        r_mass = sum(r_cnt.get(f, 0) + 1 for f in feats[d])
        out[d] = (len(feats[d]), t_mass, r_mass, t_mass / r_mass * r_tot / t_tot)
    return out


DOCS = [
    (1, "spark join shuffle plan spark join", "en"),
    (2, "spark join shuffle plan table scan", "en"),
    (3, "fenster tisch stuhl baum fluss", "de"),
    (4, "spark join shuffle plan spark join", "de"),  # en-like text, de label
    (5, "mesa silla arbol rio puente", "es"),
    (6, "", "en"),  # no tokens -> drops out
]


def test_dsir_weights_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in dsir_weights(df).collect()}
    want = _py_weights(DOCS)
    assert set(got) == set(want)  # doc 6 absent on both sides
    for d, (n_feats, t_mass, r_mass, weight) in want.items():
        r = got[d]
        assert (r.n_feats, r.t_mass, r.r_mass) == (n_feats, t_mass, r_mass)
        assert r.weight == pytest.approx(weight, rel=1e-12)


def test_dsir_weight_ranks_target_like_text_higher(spark):
    # doc 4 carries target-vocabulary text under a non-target label —
    # importance weighting exists exactly to pull such docs forward.
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    w = {r.doc_id: r.weight for r in dsir_weights(df).collect()}
    assert w[4] > w[3] and w[4] > w[5]


def test_dsir_select_takes_ceil_fraction_per_lang(spark):
    docs = [(i, f"w{i} common word soup", ["en", "de"][i % 2]) for i in range(1, 12)]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    sel = dsir_select(df, fraction=0.25).collect()
    by_lang: dict[str, int] = {}
    for r in sel:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    n = {"en": 6, "de": 5}  # ids 2,4,..10 -> de(5); 1,3,..11 -> en(6)
    assert by_lang == {lang: math.ceil(0.25 * c) for lang, c in n.items()}


def test_budget_select_prefix_semantics(spark):
    # One lang; distinct-ratio quality order is doc 1 (ratio 1.0),
    # doc 2 (0.75), doc 3 (0.5), doc 4 (0.33).
    docs = [
        (1, "alpha bravo charlie delta", "en"),          # 4 tok, ratio 1.0
        (2, "echo foxtrot golf golf", "en"),             # 4 tok, ratio .75
        (3, "hotel hotel india india", "en"),            # 4 tok, ratio .5
        (4, "kilo kilo kilo", "en"),                     # 3 tok, ratio .33
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    got = {r.doc_id: r.cum_tokens for r in budget_select(df, budget=9).collect()}
    # prefix in quality order: doc1 (cum 4), doc2 (cum 8) fit; doc3
    # (cum 12) exceeds; doc4 (cum 15) stays out even though its own 3
    # tokens would "fit" the leftover — budget admission is a prefix,
    # not a knapsack.
    assert got == {1: 4, 2: 8}


def test_budget_select_excludes_zero_token_docs(spark):
    docs = [(1, "alpha bravo", "en"), (2, "", "en"), (3, "12345 !!!", "en")]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    assert [r.doc_id for r in budget_select(df, budget=100).collect()] == [1]


def test_budget_select_scalable_identical_rows(spark):
    """The scalable form must admit EXACTLY the window form's documents
    — including a boundary group whose docs are only partially admitted
    (docs 21/22 share qkey; 21 fits, 22 doesn't), a language where
    everything fits (no boundary row), and a language whose FIRST group
    already exceeds the budget."""
    docs = [
        # en: ratios 1.0 (doc 11), .5 shared by 21/22, .33 (doc 31)
        (11, "alpha bravo charlie delta", "en"),        # 4 tok, cum 4
        (21, "echo echo golf golf", "en"),              # 4 tok, cum 8 <= 9
        (22, "hotel hotel india india", "en"),          # 4 tok, cum 12 > 9
        (31, "kilo kilo kilo", "en"),                   # past boundary
        # de: total 5 tokens, all fit -> no boundary row for de
        (41, "fenster tisch", "de"),
        (42, "baum fluss berg", "de"),
        # es: first (only) group alone exceeds the budget -> prefix
        # within it: 51 (6 tok) fits, 52 (6 tok, cum 12) does not
        (51, "uno dos tres cuatro cinco seis", "es"),
        (52, "seis cinco cuatro tres dos uno", "es"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    exact = {(r.doc_id, r.lang, r.n_tokens)
             for r in budget_select(df, budget=9).collect()}
    scal = {(r.doc_id, r.lang, r.n_tokens)
            for r in budget_select_scalable(df, budget=9).collect()}
    assert exact == scal
    assert {d for d, _, _ in exact} == {11, 21, 41, 42, 51}


def test_budget_select_scalable_matches_on_fixture(spark):
    """Set equality against the window form on the real documents
    fixture — every admission case the corpus happens to produce."""
    from meilisync_spark.sources.parquet import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {(r.doc_id, r.lang, r.n_tokens) for r in budget_select(docs).collect()}
    scal = {(r.doc_id, r.lang, r.n_tokens)
            for r in budget_select_scalable(docs).collect()}
    assert exact == scal and len(exact) > 0


def test_budget_select_scalable_plan_shape(spark):
    """The windows in the scalable plan must never run over the raw
    per-doc table: one window sits above the (lang, qkey) aggregate
    (bounded at RATIO_SCALE+1 rows per lang by construction), the other
    above the boundary-group filter. The per-doc admission join is a
    broadcast of the <=1-row-per-lang boundary table."""
    from meilisync_spark.sources.parquet import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = budget_select_scalable(docs)._jdf.queryExecution().executedPlan().toString()
    # 3 Window nodes: the (lang,qkey) group cumsum appears twice (the
    # tiny boundary subtree feeds both union branches) plus the
    # boundary-group doc refinement — whose input Catalyst turns into
    # an INNER BroadcastHashJoin on (lang, qkey)=(lang, b_qkey) with
    # the <=1-row-per-lang boundary table, i.e. the per-doc window only
    # ever sees the boundary group's docs. No window over the raw
    # per-doc table anywhere.
    assert plan.count("Window") == 3
    assert "b_qkey" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_dsir_select_scalable_no_window_and_agrees_when_untied(spark):
    """The scalable DSIR selection has NO window operator at all (cut
    point by aggregation, broadcast, filter), and on a tie-free corpus
    with n*fraction interpolating strictly between attained weights it
    admits exactly the window form's rows."""
    docs = [(i, f"w{i} common word soup", ["en", "de"][i % 2])
            for i in range(1, 12)]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    exact = {(r.doc_id, r.lang) for r in dsir_select(df, fraction=0.25).collect()}
    scal_rows = dsir_select_scalable(df, fraction=0.25)
    scal = {(r.doc_id, r.lang) for r in scal_rows.collect()}
    # value-threshold vs rank selection agree whenever the interpolated
    # cut separates rank k from rank k+1 (ties would widen scal)
    assert exact <= scal
    w = {r.doc_id: r.weight for r in dsir_weights(df).collect()}
    if len(set(w.values())) == len(w):
        assert exact == scal
    plan = scal_rows._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_cluster_safe_split_moves_clusters_as_a_unit(spark):
    # 14-word base doc; near-dups differ by the last word, so MinHash
    # bands collide and the three variants form one cluster. Distinct
    # docs use disjoint vocabularies.
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike"
    docs = [
        (1, base + " november"),
        (2, base + " oscar"),
        (3, base + " papa"),
        (10, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce trece catorce"),
        (11, "eins zwei drei vier fuenf sechs sieben acht neun zehn elf zwoelf dreizehn vierzehn"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r for r in cluster_safe_split(df).collect()}
    assert set(rows) == {1, 2, 3, 10, 11}
    # the near-dup trio shares one cluster AND one split
    assert rows[1].cluster_id == rows[2].cluster_id == rows[3].cluster_id == 1
    assert rows[1].split == rows[2].split == rows[3].split
    # singletons: same assignment as per-doc split_assign (shared salt)
    per_doc = {r.doc_id: r.split for r in split_assign(df).collect()}
    for d in (10, 11):
        assert rows[d].cluster_id == d
        assert rows[d].split == per_doc[d]


def test_dsir_freq_join_is_broadcast(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    plan = dsir_weights(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
