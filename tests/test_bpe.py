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


def test_bpe_encode_oov_falls_back_to_chars(spark):
    train = spark.createDataFrame(
        [(1, "aa aa aa bb bb")], "doc_id long, text string"
    )
    merges, vocab = bpe_train(train, n_merges=3)
    from meilisync_spark.operators.bpe import _char_tokens

    # an unseen word joins nothing → char fallback (len chars + EOW)
    docs = spark.createDataFrame([(2, "zzz")], "doc_id long, text string")
    enc = (
        docs.select("doc_id", F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
        ).alias("word"))
        .join(F.broadcast(vocab.select("word", "tokens")), "word", "left")
        .select(
            F.when(F.col("tokens").isNotNull(), F.size("tokens"))
            .otherwise(F.size(_char_tokens(F.col("word"))))
            .alias("n")
        )
        .collect()
    )
    assert enc[0].n == 4  # z z z </w>


def test_bpe_plans_stay_jvm_side(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    df = bpe_encode_stats(docs, n_merges=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # vocab join is broadcast
