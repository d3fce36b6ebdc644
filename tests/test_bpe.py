"""BPE tokenizer training: the Spark-declarative trainer must match a
pure-python reference implementation merge-for-merge and
token-for-token (same deterministic argmax, same greedy left-to-right
non-overlapping merge application), on the fixture corpus and on
adversarial hypothesis-generated corpora."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from meilisync_spark.operators.bpe import (
    EOW,
    bpe_encode_stats,
    bpe_merge_table,
    bpe_train,
)
from meilisync_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def _py_words(text: str) -> list[str]:
    return re.findall("[a-z]+", text.lower())


def _py_apply(t: list[str], left: str, right: str) -> list[str]:
    out, i = [], 0
    while i < len(t):
        if i + 1 < len(t) and t[i] == left and t[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(t[i])
            i += 1
    return out


def _py_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference trainer (Sennrich et al. 2016 pseudocode): weighted
    pair counts over the vocab, argmax (count desc, left asc, right
    asc), greedy non-overlapping replacement."""
    vocab = {w: list(w) + [EOW] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            t = vocab[w]
            for a, b in zip(t, t[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if c < 2:
            break
        merges.append((left, right, c))
        vocab = {w: _py_apply(t, left, right) for w, t in vocab.items()}
    return merges, vocab


def _word_freqs(texts: list[str]) -> dict[str, int]:
    wf: dict[str, int] = {}
    for t in texts:
        for w in _py_words(t):
            wf[w] = wf.get(w, 0) + 1
    return wf


def test_bpe_train_matches_python_reference_on_fixture(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    texts = [r.text for r in docs.select("text").collect() if r.text]
    merges, vocab = bpe_train(docs, n_merges=12)
    py_merges, py_vocab = _py_bpe(_word_freqs(texts), 12)
    assert [(l, r, c) for l, r, c in merges] == py_merges
    got = {r.word: list(r.tokens) for r in vocab.collect()}
    assert got == py_vocab


@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=12
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_bpe_train_matches_python_reference_adversarial(spark, words):
    """Tiny two-letter alphabet forces heavy pair ties and overlapping
    runs (aaaa...) — the cases where greedy non-overlap and the
    deterministic tie-break matter."""
    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges, vocab = bpe_train(docs, n_merges=6)
    py_merges, py_vocab = _py_bpe(_word_freqs([text]), 6)
    assert [(l, r, c) for l, r, c in merges] == py_merges
    got = {r.word: list(r.tokens) for r in vocab.collect()}
    assert got == py_vocab


def test_bpe_merge_table_and_encode_stats(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    mt = bpe_merge_table(docs, n_merges=10).collect()
    assert [r.rank for r in mt] == list(range(1, len(mt) + 1))
    assert all(r.merged == r.left + r.right for r in mt)
    # counts are non-increasing ONLY per-pair-generation, but every
    # learned merge must have been worth it
    assert all(r.weighted_count >= 2 for r in mt)

    stats = bpe_encode_stats(docs, n_merges=10)
    rows = stats.collect()
    n_docs = docs.where(F.length("text") > 0).count()
    assert len(rows) == n_docs
    # merges only ever shrink the symbol count: compression >= 1 and
    # n_tokens <= initial symbols
    assert all(r.compression >= 1.0 for r in rows)
    # and the encode side really used the trained segmentation: with
    # 10 merges on a 40-word vocab, SOME doc must compress
    assert any(r.compression > 1.0 for r in rows)


def test_bpe_encode_oov_applies_trained_merges(spark):
    """Unseen words are segmented by the trained merges (rank-order
    fold), NOT a char fallback: with merges learned on `aa`/`bb`, the
    held-out `aaaa` compresses while `zzz` (no applicable merge) stays
    at characters."""
    train = spark.createDataFrame(
        [(1, "aa aa aa bb bb")], "doc_id long, text string"
    )
    merges, _ = bpe_train(train, n_merges=3)
    docs = spark.createDataFrame(
        [(2, "zzz"), (3, "aaaa")], "doc_id long, text string"
    )
    stats = {
        r.doc_id: r for r in bpe_encode_stats(docs, 3, train_docs=train).collect()
    }
    # zzz: z z z </w> — merges touch nothing
    assert stats[2].n_tokens == 4
    # aaaa: python-fold the learned merges over [a,a,a,a,</w>]
    t = list("aaaa") + [EOW]
    for l, r, _c in merges:
        t = _py_apply(t, l, r)
    assert stats[3].n_tokens == len(t)
    assert len(t) < 5  # the held-out word genuinely compressed


def test_bpe_apply_merges_matches_python_on_disjoint_vocab(spark):
    """Held-out corpus with a vocabulary DISJOINT from training: every
    unseen word must encode token-for-token as the pure-python
    reference fold of the trained merge sequence."""
    from meilisync_spark.operators.bpe import bpe_apply_merges

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    texts = [r.text for r in docs.select("text").collect() if r.text]
    merges, _ = bpe_train(docs, n_merges=12)
    train_vocab = set(_word_freqs(texts))
    # held-out words: pairwise concatenations of training words (rich
    # in learned subwords ⇒ merges really fire) plus one alien string
    base = sorted(train_vocab)[:12]
    held = [a + b for a, b in zip(base, base[1:])] + ["qzxqzxqzx"]
    held = [w for w in held if w not in train_vocab]
    assert held
    wdf = spark.createDataFrame([(w,) for w in held], "word string")
    got = {
        r.word: list(r.tokens) for r in bpe_apply_merges(wdf, merges).collect()
    }
    compressed = 0
    for w in held:
        t = list(w) + [EOW]
        for l, r, _c in merges:
            t = _py_apply(t, l, r)
        assert got[w] == t, w
        compressed += len(t) < len(w) + 1
    assert compressed  # at least one held-out word actually merged


def test_bpe_plans_stay_jvm_side(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    df = bpe_encode_stats(docs, n_merges=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # vocab join is broadcast


def test_bpe_fast_encoder_matches_fold_on_trained_merges(spark):
    """The classic per-word lowest-rank loop (production twin) agrees
    token-for-token with the rank-order fold on REAL trained merges —
    training can only produce alias-free lists in practice here, and
    merges_aliased certifies the precondition explicitly."""
    from meilisync_spark.operators.bpe import (
        bpe_apply_merges,
        bpe_apply_merges_fast,
        merges_aliased,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    texts = [r.text for r in docs.select("text").collect() if r.text]
    merges, _ = bpe_train(docs, n_merges=12)
    assert merges_aliased(merges) == []
    train_vocab = set(_word_freqs(texts))
    base = sorted(train_vocab)[:12]
    held = [a + b for a, b in zip(base, base[1:])] + ["qzxqzxqzx", "a"]
    held = sorted({w for w in held if w not in train_vocab})
    wdf = spark.createDataFrame([(w,) for w in held], "word string")
    fold = {
        r.word: list(r.tokens) for r in bpe_apply_merges(wdf, merges).collect()
    }
    fast = {
        r.word: list(r.tokens)
        for r in bpe_apply_merges_fast(wdf, merges).collect()
    }
    assert fast == fold


def test_bpe_aliased_merges_detected_and_divergence_pinned(spark):
    """The documented aliasing caveat, exercised both ways: a merge
    list where two distinct merges yield 'abc' — merges_aliased flags
    it, the classic loop merges through the late-created symbol while
    the single-pass fold (whose rank-3 turn has already passed when
    rank-4 creates 'abc') cannot. The fast encoder is the reference
    semantics here; the fold is the documented approximation."""
    from meilisync_spark.operators.bpe import (
        bpe_apply_merges,
        bpe_apply_merges_fast,
        merges_aliased,
    )

    merges = [
        ("a", "b"),    # 0: ab
        ("b", "c"),    # 1: bc
        ("a", "bc"),   # 2: abc  <-- alias source
        ("z", "abc"),  # 3: zabc (consumes abc, rank BEFORE the alias)
        ("ab", "c"),   # 4: abc  <-- alias: second producer of 'abc'
    ]
    assert merges_aliased(merges) == ["abc"]
    wdf = spark.createDataFrame([("zabc",)], "word string")
    # fold: rank 0 eats (a,b) first [greedy l-to-r], rank 3 finds no
    # 'abc' yet, rank 4 creates it too late -> [z, abc, </w>]
    fold = bpe_apply_merges(wdf, merges).collect()[0].tokens
    assert list(fold) == ["z", "abc", EOW]
    # classic loop re-scans: (a,b) -> (ab,c) -> (z,abc) -> [zabc, </w>]
    fast = bpe_apply_merges_fast(wdf, merges).collect()[0].tokens
    assert list(fast) == ["zabc", EOW]


def test_bpe_encode_stats_oov_encoder_paths_agree(spark):
    """fold/fast/auto produce identical encode stats on a held-out
    corpus (alias-free trained merges), and auto picks the fold at
    small merge counts (plan stays JVM-side)."""
    train = spark.createDataFrame(
        [(1, "aa aa aa bb bb abab abab")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(2, "zzz aaaa"), (3, "ababab bbaa")], "doc_id long, text string"
    )
    outs = {
        enc: sorted(
            (r.doc_id, r.n_words, r.n_tokens, round(r.compression, 9))
            for r in bpe_encode_stats(
                docs, 4, train_docs=train, oov_encoder=enc
            ).collect()
        )
        for enc in ("fold", "fast", "auto")
    }
    assert outs["fold"] == outs["fast"] == outs["auto"]
    auto_plan = (
        bpe_encode_stats(docs, 4, train_docs=train)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in auto_plan  # auto == fold here


def test_bpe_train_fast_matches_catalyst_trainer_on_fixture(spark):
    """The production in-process trainer (indexed learner over the
    collected weighted-word table) must be bit-exact vs the Catalyst
    fold trainer: same merges (count desc / left asc / right asc
    argmax), same final vocab segmentation."""
    from meilisync_spark.operators.bpe import bpe_train_fast

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    merges_c, vocab_c = bpe_train(docs, n_merges=12)
    merges_f, vocab_f = bpe_train_fast(docs, n_merges=12)
    assert merges_f == merges_c
    got_c = {r.word: list(r.tokens) for r in vocab_c.collect()}
    got_f = {r.word: list(r.tokens) for r in vocab_f.collect()}
    assert got_f == got_c


@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=12
    )
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_bpe_train_fast_matches_python_reference_adversarial(spark, words):
    """The indexed learner's lazy-deletion heap must survive the same
    tie-heavy overlapping-run corpora as the Catalyst trainer: stale
    heap entries from decremented AND incremented pairs, early stop,
    within-word repeated pairs."""
    from meilisync_spark.operators.bpe import bpe_train_fast

    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges, vocab = bpe_train_fast(docs, n_merges=6)
    py_merges, py_vocab = _py_bpe(_word_freqs([text]), 6)
    assert [(l, r, c) for l, r, c in merges] == py_merges
    got = {r.word: list(r.tokens) for r in vocab.collect()}
    assert got == py_vocab


def test_indexed_trainer_pure_python_deep_merges():
    """Driver-side unit check at a depth the fold trainer never runs:
    256 merges over a zipf-ish synthetic vocab, indexed learner vs the
    naive reference — exercises long merge chains where a pair's count
    INCREASES after a merge (stale low heap entries)."""
    from meilisync_spark.operators.bpe import _train_merges_indexed

    import random

    rng = random.Random(7)
    alphabet = "abcdefgh"
    wf: dict[str, int] = {}
    for i in range(400):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 10)))
        wf[w] = wf.get(w, 0) + rng.randint(1, 50)
    merges, vocab = _train_merges_indexed(wf, 256)
    py_merges, py_vocab = _py_bpe(wf, 256)
    assert merges == py_merges
    assert vocab == py_vocab


def test_pick_oov_encoder_never_flips_on_aliased_lists():
    """ADVICE r8: auto must not change an aliased vocabulary's
    segmentation at the BPE_FOLD_MAX_MERGES boundary — aliased lists
    pick 'fast' at ANY count; alias-free lists switch purely on cost."""
    from meilisync_spark.operators.bpe import (
        BPE_FOLD_MAX_MERGES,
        _pick_oov_encoder,
    )

    aliased = [("a", "b"), ("b", "c"), ("a", "bc"), ("ab", "c")]
    assert _pick_oov_encoder(aliased) == "fast"  # small count, still fast
    pad = [(f"x{i}", f"y{i}") for i in range(BPE_FOLD_MAX_MERGES + 10)]
    assert _pick_oov_encoder(aliased + pad) == "fast"
    clean_small = [("a", "b"), ("c", "d")]
    assert _pick_oov_encoder(clean_small) == "fold"
    assert _pick_oov_encoder(pad) == "fast"


def test_bpe_train_fast_collect_guards(spark):
    """ADVICE r9 #4: the word-table collect is guarded. Defaults are
    exact (fixture merges unchanged — covered by the equality test
    above); here: the min-frequency floor drops sub-floor words before
    the collect, the top-V cap keeps the HIGHEST-frequency words with
    a deterministic (freq desc, word asc) boundary, and a cap larger
    than the vocab is a no-op."""
    from meilisync_spark.operators.bpe import (
        _cap_vocab_words,
        bpe_train_fast,
        weighted_vocab,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    wf = weighted_vocab(docs)
    freqs = {r.word: r.freq for r in wf.select("word", "freq").collect()}

    # floor: training with min_word_freq=2 equals training the
    # python reference on the floored table
    floored = {w: f for w, f in freqs.items() if f >= 2}
    merges_ref = _py_bpe(floored, 8)[0]
    merges_f, vocab_f = bpe_train_fast(docs, n_merges=8, min_word_freq=2)
    assert [(l, r) for l, r, _ in merges_f] == [(l, r) for l, r, _ in merges_ref]
    vocab_words = {r.word for r in vocab_f.select("word").collect()}
    assert vocab_words == set(floored)  # sub-floor words absent

    # cap: deterministic top-V semantics
    cap = min(50, len(freqs) - 5)
    capped = {r.word: r.freq for r in
              _cap_vocab_words(wf, cap).select("word", "freq").collect()}
    expected = dict(sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:cap])
    assert capped == expected

    # oversized cap: no-op
    total = len(freqs)
    assert _cap_vocab_words(wf, total + 10).count() == total

    # end-to-end: a cap engaged mid-training still trains (on the
    # capped table) and matches the python reference on that table
    merges_cap, _ = bpe_train_fast(docs, n_merges=8, max_vocab_words=cap)
    merges_cap_ref = _py_bpe(expected, 8)[0]
    assert [(l, r) for l, r, _ in merges_cap] == [
        (l, r) for l, r, _ in merges_cap_ref
    ]
