"""Byte-pair-encoding tokenizer training + encoding, Spark-declarative.

The real BPE trainer shape (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): training never touches
the corpus per iteration — it operates on the WORD-FREQUENCY VOCAB
(one row per distinct word, its corpus count carried as a weight),
which is what makes BPE trainable at 100 TB: the corpus is scanned
once to build the weighted vocab (hash groupBy, map-side combined),
and every one of the N merge iterations is a job over that vocab-sized
frame (pair explode → weighted count → driver argmax → fold-apply),
bounded by |vocab|, not |corpus|.

All of it is JVM-side Catalyst: the pair explode is a slice+zip_with,
the merge application is an ``F.aggregate`` fold carrying
``(acc, prev)`` state (greedy LEFT-TO-RIGHT non-overlapping
replacement — ``a a a`` under merge ``(a,a)`` becomes ``[aa, a]``,
exactly the reference implementation's behavior), and encoding is a
broadcast join of the corpus's words against the trained vocab's final
token arrays. No Python in any hot path.

Determinism: the winning pair each round is ``(count DESC, left ASC,
right ASC)`` — a total order, so the merge sequence is reproducible
across engines and replicated token-for-token by the pure-python model
in tests/test_bpe.py. Iterative training ⇒ rows-only rows (no DuckDB
oracle), same verification contract as k-means/PQ.

End-of-word marker: ``</w>`` is appended as its own symbol (the
standard trick that lets the tokenizer distinguish "est" in "highest"
from the word "est"), so learned subwords never span word boundaries.

Encoding of words NEVER seen at training time applies the trained
merges to the word's character symbols in rank order
(:func:`bpe_apply_merges`). Rank-order single-pass application is
equivalent to the classic "repeatedly merge the lowest-rank pair
present" loop because (a) a merge's output symbol can only participate
in LATER-rank pairs — any merge consuming a symbol was necessarily
learned after the merge that created it — and (b) merging two symbols
never creates a NEW adjacency between two pre-existing symbols, so
once a rank's turn has passed its pair can never reappear.

Aliasing caveat to claim (a): when two DISTINCT merges produce the
same output string — e.g. ``(a, bc)`` at rank 2 and ``(ab, c)`` at
rank 5 both yielding ``abc`` — a pair consuming that symbol can carry
a rank earlier than the merge that created this particular occurrence,
and the classic min-rank loop would still apply it after rank 5 while
the single pass has moved on. So the equivalence is exact EXCEPT for
vocabularies containing aliased merge outputs; with such a vocabulary
the single pass is a deterministic, well-defined segmentation but may
differ from the iterative loop on words where the aliased symbol
arises via the later merge. (The pure-python oracle in
tests/test_bpe.py folds merges in the same rank order, so it verifies
THIS semantics, not the iterative loop's.) The fold runs over the DISTINCT unseen words
(vocab-sized, corpus-independent, like training), with the expression
chain pinned every few merges so lineage depth stays O(1). Seen words —
all of them, when encoding the training corpus — take their exact
trained segmentation via the broadcast vocab join, so the OOV fold
costs nothing there.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meilisync_spark.operators.text import words_col
from meilisync_spark.sources.parquet import spread
from meilisync_spark.pin import SER as _SER

BPE_MERGES_DEFAULT = 24
EOW = "</w>"


def _char_tokens(word: Column) -> Column:
    """word → its initial symbol array: characters + the end-of-word
    marker as a separate symbol."""
    return F.concat(F.split(word, ""), F.array(F.lit(EOW)))


def _adjacent_pairs(tokens: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs (empty for 1-symbol
    arrays — slice of length 0)."""
    n = F.size(tokens)
    return F.zip_with(
        F.slice(tokens, 1, n - 1),
        F.slice(tokens, 2, n - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )


def _apply_merge(tokens: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping replacement of the adjacent
    pair (left, right) with its concatenation — one ``F.aggregate``
    fold carrying (acc, prev): prev holds the symbol that might start a
    match; a match flushes the merged symbol and clears prev (so the
    merged result can NOT immediately re-match as ``left``, the
    reference non-overlap rule)."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(s: Column, x: Column) -> Column:
        is_match = s.getField("prev").isNotNull() & (
            s.getField("prev") == left
        ) & (x == right)
        return F.when(
            is_match,
            F.struct(
                F.concat(s.getField("acc"), F.array(F.lit(merged))).alias("acc"),
                F.lit(None).cast("string").alias("prev"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    s.getField("prev").isNotNull(),
                    F.concat(s.getField("acc"), F.array(s.getField("prev"))),
                )
                .otherwise(s.getField("acc"))
                .alias("acc"),
                x.alias("prev"),
            )
        )

    def fin(s: Column) -> Column:
        return F.when(
            s.getField("prev").isNotNull(),
            F.concat(s.getField("acc"), F.array(s.getField("prev"))),
        ).otherwise(s.getField("acc"))

    return F.aggregate(tokens, init, step, fin)


def weighted_vocab(docs: DataFrame) -> DataFrame:
    """(word, freq, tokens) — the trainer's working frame: one row per
    distinct corpus word with its occurrence count and initial
    character segmentation. ONE corpus scan; everything after is
    vocab-sized."""
    docs = spread(docs)
    tok = docs.select(F.explode(words_col(F.col("text"))).alias("word"))
    return (
        tok.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("tokens", _char_tokens(F.col("word")))
    )


def bpe_train(
    docs: DataFrame, n_merges: int = BPE_MERGES_DEFAULT
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` merges; returns (merges, trained_vocab) where
    merges is ``[(left, right, weighted_count), ...]`` in learned order
    and trained_vocab is (word, freq, tokens) with the FINAL
    segmentation of every training word (the encode side's join table).

    Each iteration: weighted adjacent-pair count over the vocab frame
    (map-side combined, |symbol-pairs| result), a 1-row driver argmax,
    and a fold-apply — then the frame is pinned (localCheckpoint) so
    iteration k+1's lineage doesn't nest k fold expressions deep.
    Stops early when no pair occurs at least twice."""
    vocab = weighted_vocab(docs).localCheckpoint(True, storageLevel=_SER)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts = (
            vocab.select("freq", F.explode(_adjacent_pairs(F.col("tokens"))).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
        )
        best = counts.orderBy(F.desc("c"), F.asc("l"), F.asc("r")).first()
        if best is None or best.c < 2:
            break
        merges.append((best.l, best.r, int(best.c)))
        vocab = vocab.withColumn(
            "tokens", _apply_merge(F.col("tokens"), best.l, best.r)
        ).localCheckpoint(True, storageLevel=_SER)
    return merges, vocab


def _train_merges_indexed(
    word_freqs: dict[str, int], n_merges: int
) -> tuple[list[tuple[str, str, int]], dict[str, list[str]]]:
    """In-process BPE trainer over a weighted word table — the indexed
    form of the Sennrich et al. 2016 learner: pair→count and
    pair→containing-words indexes maintained incrementally, argmax via
    a lazy-deletion heap ordered (count DESC, left ASC, right ASC) —
    the same total order as :func:`bpe_train`'s Catalyst argmax, so the
    two produce identical merge sequences (tests pin this on the
    fixture and under hypothesis).

    Cost: O(total_symbols) setup, then per merge O(words containing
    the winning pair × their length) re-segmentation plus O(log heap)
    argmax — NOT a pass over the vocab per merge, which is what makes
    32k-merge vocabs train in minutes. Lazy deletion: every count
    change pushes a fresh heap entry; a popped entry is valid only if
    its count still matches the live index (stale entries — higher
    from decrements, lower from increments — are discarded at the
    top), so the surviving top is the true argmax."""
    import heapq

    words = sorted(word_freqs)  # deterministic idx assignment
    segs = [list(w) + [EOW] for w in words]
    freqs = [word_freqs[w] for w in words]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, (seg, f) in enumerate(zip(segs, freqs)):
        for p in zip(seg, seg[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(i)
    heap = [(-c, l, r) for (l, r), c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = None
        while heap:
            negc, l, r = heap[0]
            if pair_counts.get((l, r), 0) != -negc:
                heapq.heappop(heap)  # stale
                continue
            best = (l, r, -negc)
            break
        if best is None or best[2] < 2:
            break
        left, right, c = best
        merges.append((left, right, c))
        touched = pair_words.pop((left, right), set())
        del pair_counts[(left, right)]
        changed: set[tuple[str, str]] = set()
        for i in touched:
            seg, f = segs[i], freqs[i]
            for p in zip(seg, seg[1:]):
                if p in pair_counts:
                    pair_counts[p] -= f
                    changed.add(p)
                pw = pair_words.get(p)
                if pw is not None:
                    pw.discard(i)
            # greedy left-to-right non-overlapping replacement — the
            # same rule as _apply_merge's fold
            out: list[str] = []
            j, n = 0, len(seg)
            while j < n:
                if j + 1 < n and seg[j] == left and seg[j + 1] == right:
                    out.append(left + right)
                    j += 2
                else:
                    out.append(seg[j])
                    j += 1
            segs[i] = out
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(i)
                changed.add(p)
        for p in changed:
            c2 = pair_counts.get(p, 0)
            if c2 > 0:
                heapq.heappush(heap, (-c2, p[0], p[1]))
            else:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
    return merges, {w: segs[i] for i, w in enumerate(words)}


# Hard driver-memory guard on bpe_train_fast's word-table collect.
# Heaps' law says clean text stays at "a few million distinct words"
# at any corpus size, but noisy 100-TB web corpora carry junk tokens
# (hex blobs, session ids, mangled unicode) well past that — and those
# are exactly the words a frequency cut removes first. 8M rows ≈ a few
# hundred MB collected, a bounded driver cost by construction.
BPE_MAX_VOCAB_WORDS = 8_000_000


def _cap_vocab_words(wf: DataFrame, cap: int) -> DataFrame:
    """Deterministic top-``cap`` words by (freq DESC, word ASC) without
    a vocab-wide single-partition sort: pick the frequency cutoff from
    the (freq → word count) histogram — bounded by |distinct freq
    values|, heavy-tailed in practice — keep everything strictly above
    it, and fill the remainder from the boundary frequency class alone
    (one small sort+limit over that class, not the whole table)."""
    hist = sorted(
        ((r["freq"], r["n"]) for r in
         wf.groupBy("freq").agg(F.count(F.lit(1)).alias("n")).collect()),
        reverse=True,
    )
    kept, cutoff = 0, None
    for freq, n in hist:
        if kept + n > cap:
            cutoff = freq
            break
        kept += n
    if cutoff is None:
        return wf  # under the cap after all (races with a growing view)
    above = wf.where(F.col("freq") > cutoff)
    boundary = (
        wf.where(F.col("freq") == cutoff)
        .orderBy(F.asc("word"))
        .limit(cap - kept)
    )
    return above.unionByName(boundary)


def bpe_train_fast(
    docs: DataFrame, n_merges: int = BPE_MERGES_DEFAULT,
    min_word_freq: int = 1,
    max_vocab_words: int = BPE_MAX_VOCAB_WORDS,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Production-scale BPE training: same contract as
    :func:`bpe_train` — returns ``(merges, trained_vocab)``, merge
    sequence identical token-for-token — but trains all merges
    IN-PROCESS over the collected weighted word table instead of one
    sequential Catalyst job per merge.

    Why this is the right distribution boundary (the
    ``kmeans_centroids`` / ``pq_codebooks`` pattern,
    operators/kmeans.py:40): the corpus is scanned ONCE, distributed,
    to build ``weighted_vocab`` — a frame bounded by |distinct words|,
    not |corpus| (Heaps' law: ~a few million rows even at 100 TB of
    text, i.e. driver-sized by construction the way k-means' k×dim
    centroid matrix is). Training then iterates |merges| times over
    that bounded table; doing those iterations as distributed jobs
    buys no parallelism worth one scheduler round-trip each, and at a
    production 32k-merge vocab the per-merge job latency alone (~0.13
    s) is hours. The indexed in-process learner
    (:func:`_train_merges_indexed`) touches only words containing the
    winning pair per merge — minutes for 32k merges (SCALE.md, BPE
    trainer row). The trained-vocab frame is then rebuilt
    DISTRIBUTED — merges broadcast in a mapInPandas closure over the
    vocab frame — so nothing vocab-sized ships driver→cluster.

    ``bpe_train`` (the Catalyst fold loop) remains the cross-engine
    oracle twin for small merge counts; tests assert the two agree
    merge-for-merge and token-for-token on the fixture and under
    hypothesis-generated corpora.

    The collect is GUARDED (ADVICE r9): ``min_word_freq`` drops words
    rarer than the floor before collecting (Sennrich's learn_bpe ships
    the same ``--min-frequency`` knob; default 1 = exact, so the
    fold-twin equality tests hold), and ``max_vocab_words`` is a hard
    deterministic top-V cap (freq DESC, word ASC) that only engages
    past BPE_MAX_VOCAB_WORDS distinct words. Boundary, stated
    honestly: dropping a word of frequency f removes at most
    f·(len(word)) from any pair count, so every merge whose winning
    margin over the runner-up exceeds the TOTAL dropped weighted mass
    is provably unchanged; merges decided by thinner margins can
    reorder — the standard, documented BPE-training approximation.
    Dropped words are also absent from the returned trained_vocab
    (they re-enter at encode time through the OOV path)."""
    wf = weighted_vocab(docs)  # one corpus scan
    if min_word_freq > 1:
        wf = wf.where(F.col("freq") >= min_word_freq)
    wf = wf.localCheckpoint(True, storageLevel=_SER)
    if wf.count() > max_vocab_words:
        wf = _cap_vocab_words(wf, max_vocab_words).localCheckpoint(
            True, storageLevel=_SER
        )
    word_freqs = {r.word: r.freq for r in wf.select("word", "freq").collect()}
    merges, _ = _train_merges_indexed(word_freqs, n_merges)
    # Rebuild the trained vocab distributed. Rank-order single-pass
    # application (what training itself did to every word) is the fold
    # semantics; the fast per-word encoder replicates it exactly on
    # alias-free merge lists (module docstring (a)+(b)). With aliased
    # outputs the fast encoder could diverge from the training-time
    # segmentation, so fall back to the fold — aliased lists are rare
    # and the fold stays correct at any size, just slower.
    enc = bpe_apply_merges_fast if not merges_aliased(merges) else bpe_apply_merges
    vocab = wf.select("word", "freq").join(
        enc(wf.select("word"), merges), "word"
    ).select("word", "freq", "tokens")
    return merges, vocab


BPE_PIN_EVERY = 4  # fold-chain depth between lineage pins
# above this many merges the fold chain stops being reasonable (one
# Catalyst aggregate per merge + an eager pin job every BPE_PIN_EVERY)
# and bpe_encode_stats switches its OOV path to the classic per-word
# encoder (bpe_apply_merges_fast) — see the module docstring's
# equivalence argument for why the two agree on alias-free merge lists
BPE_FOLD_MAX_MERGES = 64


def merges_aliased(
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
) -> list[str]:
    """Output strings produced by MORE THAN ONE distinct merge — the
    exact precondition under which single-pass rank-order application
    (:func:`bpe_apply_merges`) can diverge from the classic iterative
    lowest-rank loop (:func:`bpe_apply_merges_fast`); empty ⇒ the two
    encoders agree token-for-token on every input. Cheap (driver-side,
    |merges| work) — callers that need the fold's oracle semantics at
    scale should check this at train time."""
    seen: dict[str, int] = {}
    for m in merges:
        out = m[0] + m[1]
        seen[out] = seen.get(out, 0) + 1
    return sorted(o for o, c in seen.items() if c > 1)


def bpe_apply_merges(
    words: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    pin_every: int = BPE_PIN_EVERY,
) -> DataFrame:
    """``(word)`` → ``(word, tokens)``: segment arbitrary words with an
    already-trained merge list — the BPE *encoder* for words outside
    the training vocab. Character-init (chars + EOW), then every merge
    applied greedily left-to-right in learned rank order; see the
    module docstring for why single-pass rank order replicates the
    reference "lowest-rank pair first" loop token-for-token.

    Scale shape: callers pass the DISTINCT unseen words (vocab-sized),
    so like training the cost is bounded by |vocab|, never |corpus|;
    ``pin_every`` bounds how many ``F.aggregate`` folds nest in one
    Catalyst expression before a localCheckpoint pin (deep chains blow
    past whole-stage-codegen's method-size limit and fall back to
    interpreted evaluation)."""
    out = words.withColumn("tokens", _char_tokens(F.col("word")))
    for i, m in enumerate(merges):
        left, right = m[0], m[1]
        out = out.withColumn(
            "tokens", _apply_merge(F.col("tokens"), left, right)
        )
        if (i + 1) % pin_every == 0 and (i + 1) < len(merges):
            out = out.localCheckpoint(True, storageLevel=_SER)
    return out


def bpe_apply_merges_fast(
    words: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
) -> DataFrame:
    """``(word)`` → ``(word, tokens)``: the classic per-word BPE encode
    loop — repeatedly merge the LOWEST-RANK adjacent pair present
    (greedy left-to-right non-overlapping within each pass) until no
    trained pair remains. This is the reference tokenizer algorithm
    (Sennrich et al. 2016 encoder; same loop as GPT-2's bpe()) and the
    production form for real vocab sizes: per-word cost is
    O(passes × len), INDEPENDENT of |merges| — while the fold twin
    (:func:`bpe_apply_merges`) builds one Catalyst aggregate per merge
    plus an eager pin job every ``BPE_PIN_EVERY``, which is the right
    shape only for small merge lists (BPE_PIN_PROBE.json measures the
    crossover).

    Equivalence: on ALIAS-FREE merge lists (no output string produced
    by two distinct merges — :func:`merges_aliased` returns []) this
    agrees token-for-token with the rank-order fold, per the module
    docstring's argument (a)+(b). On aliased lists THIS encoder is the
    reference semantics and the fold is the documented approximation
    (tests/test_bpe.py pins a diverging example both ways).

    Python earns its place here: the loop is data-dependent iteration
    over a vocab-sized frame (distinct OOV words, never the corpus),
    Arrow-batched via mapInPandas. Closure binds everything by value —
    no module globals — so workers need no importable package."""
    rank_of = {(m[0], m[1]): i for i, m in enumerate(merges)}
    pair_of = [(m[0], m[1]) for m in merges]
    eow = EOW  # bind by value into the closure

    def _encode_batches(batches):
        import pandas as pd

        def enc(word):
            syms = list(word) + [eow]
            while len(syms) > 1:
                best = None
                for a, b in zip(syms, syms[1:]):
                    r = rank_of.get((a, b))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                left, right = pair_of[best]
                merged = left + right
                out, i = [], 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        out.append(merged)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        for pdf in batches:
            yield pd.DataFrame(
                {"word": pdf["word"], "tokens": [enc(w) for w in pdf["word"]]}
            )

    return words.select("word").mapInPandas(
        _encode_batches, "word string, tokens array<string>"
    )


def _train(docs: DataFrame, n_merges: int, trainer: str):
    """Trainer dispatch: ``"catalyst"`` (:func:`bpe_train`, the
    declarative fold loop — the cross-engine oracle form, one job per
    merge), ``"driver"`` (:func:`bpe_train_fast`, in-process over the
    bounded weighted-word table — production merge counts), or
    ``"auto"`` (catalyst up to BPE_FOLD_MAX_MERGES, driver beyond).
    The two produce IDENTICAL merges and vocab (tests pin it), so auto
    is a pure cost switch — no semantics boundary, unlike the encoder
    aliasing case below."""
    if trainer == "auto":
        trainer = "catalyst" if n_merges <= BPE_FOLD_MAX_MERGES else "driver"
    if trainer not in ("catalyst", "driver"):
        raise ValueError(f"trainer must be catalyst|driver|auto, got {trainer!r}")
    return (bpe_train if trainer == "catalyst" else bpe_train_fast)(docs, n_merges)


def bpe_merge_table(
    docs: DataFrame,
    n_merges: int = BPE_MERGES_DEFAULT,
    trainer: str = "auto",
) -> DataFrame:
    """(rank, left, right, merged, weighted_count) — the learned merge
    sequence as a frame (what a tokenizer file ships)."""
    merges, _ = _train(docs, n_merges, trainer)
    spark = docs.sparkSession
    rows = [
        (i + 1, l, r, l + r, c) for i, (l, r, c) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, weighted_count long"
    )


def _pick_oov_encoder(
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
) -> str:
    """auto-mode encoder choice. On an ALIASED merge list the fold and
    the classic loop genuinely differ, so a purely count-based switch
    would flip a vocabulary's segmentation the moment it crosses
    BPE_FOLD_MAX_MERGES (ADVICE r8, silent semantics flip): aliased
    lists always take ``fast`` (the classic reference loop), count
    only arbitrates the alias-free case where the two are provably
    identical."""
    if merges_aliased(merges):
        return "fast"
    return "fold" if len(merges) <= BPE_FOLD_MAX_MERGES else "fast"


def bpe_encode_stats(
    docs: DataFrame,
    n_merges: int = BPE_MERGES_DEFAULT,
    train_docs: DataFrame | None = None,
    oov_encoder: str = "auto",
    trainer: str = "auto",
) -> DataFrame:
    """(doc_id, n_words, n_tokens, compression) — every document
    re-encoded with the trained segmentation: corpus words broadcast-
    join the trained vocab's final token arrays; words OUTSIDE the
    training vocab are segmented by :func:`bpe_apply_merges` (the
    trained merges fold-applied in rank order over the distinct unseen
    words — token-for-token the reference encoder, not a char
    fallback). n_tokens sums per-word token counts, compression =
    symbols-before / tokens-after (initial chars+EOW over BPE tokens;
    ≥ 1.0 by construction, one final IEEE division).

    ``train_docs`` defaults to ``docs`` (encode the training corpus —
    OOV set empty by construction); pass a separate training corpus to
    exercise the held-out/OOV encoder.

    ``oov_encoder``: ``"fold"`` (the JVM rank-order fold,
    :func:`bpe_apply_merges` — oracle semantics, right for small merge
    lists), ``"fast"`` (the classic per-word loop,
    :func:`bpe_apply_merges_fast` — production vocab sizes), or
    ``"auto"`` (fold up to ``BPE_FOLD_MAX_MERGES`` merges, fast
    beyond; identical output on alias-free merge lists). On a merge
    list with ALIASED outputs the two encoders can differ, so a
    count-based switch would silently change segmentation at the
    64-merge boundary (ADVICE r8) — auto therefore consults
    :func:`merges_aliased` and, when non-empty, picks ``"fast"`` (the
    classic reference loop) REGARDLESS of merge count, so the
    segmentation of a given vocabulary never depends on its size.

    ``trainer``: see :func:`_train` — a pure cost switch (identical
    merges/vocab either way), defaulting to the Catalyst fold for
    small merge counts and the in-process indexed learner beyond."""
    merges, vocab = _train(
        train_docs if train_docs is not None else docs, n_merges, trainer
    )
    if oov_encoder == "auto":
        oov_encoder = _pick_oov_encoder(merges)
    if oov_encoder not in ("fold", "fast"):
        raise ValueError(f"oov_encoder must be fold|fast|auto, got {oov_encoder!r}")
    apply_merges = bpe_apply_merges if oov_encoder == "fold" else bpe_apply_merges_fast
    docs = spread(docs)
    words = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("word")
    )
    lookup = vocab.select("word", "tokens")
    # distinct unseen words — EMPTY when encoding the training corpus,
    # so the pin below is the only extra cost there (one distinct pass
    # over the corpus words)
    oov = (
        words.select("word")
        .distinct()
        .join(lookup.select("word"), "word", "left_anti")
        .localCheckpoint(True, storageLevel=_SER)  # pin: feeds the emptiness probe AND the fold
    )
    if not oov.isEmpty():
        lookup = lookup.unionByName(apply_merges(oov, merges))
    enc = words.join(F.broadcast(lookup), "word", "left")
    per_word = enc.select(
        "doc_id",
        # explicit null test, not coalesce: size(NULL) is -1 under
        # Spark's legacy sizeOfNull, which would silently poison counts
        F.when(F.col("tokens").isNotNull(), F.size("tokens"))
        .otherwise(F.size(_char_tokens(F.col("word"))))
        .alias("n_tok"),
        (F.length("word") + 1).alias("n_sym"),  # chars + EOW
    )
    return (
        per_word.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_sym").alias("n_sym"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens",
            (F.col("n_sym").cast("double") / F.col("n_tokens")).alias("compression"),
        )
    )
