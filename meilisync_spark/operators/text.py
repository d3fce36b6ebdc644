"""Text analysis for training-data pipelines (north-star extensions).

Everything here is pure ``pyspark.sql.functions`` — regex extraction,
higher-order array functions, hashes — no Python UDFs, so the whole
stage stays in whole-stage codegen and scales linearly with the scan
(no shuffle at all for the per-document operators; the only shuffles
are the final aggregates where noted).

Each operator carries its DuckDB-oracle SQL builder right next to the
Spark implementation so the two can't drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from meilisync_spark.functions.hashing import portable_hash64, duck_hash64
from meilisync_spark.sources.parquet import spread
from meilisync_spark.pin import SER as _SER

WORDS_RE = "[a-z]+"
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
EN_STOP = ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"]

# tiny marker-word lists for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "los", "que", "de"],
    "fr": ["le", "les", "et", "des", "une"],
}


def words_col(text: Column) -> Column:
    """Lowercased alphabetic word tokens."""
    return F.regexp_extract_all(F.lower(text), F.lit(WORDS_RE), 0)


def duck_words(text: str = "text") -> str:
    return f"regexp_extract_all(lower({text}), '{WORDS_RE}')"


def _in_list(x: Column, values: list[str]) -> Column:
    return x.isin(*values)


# ---------------------------------------------------------------------------
# Quality / stats
# ---------------------------------------------------------------------------

def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document quality signals: token counts, punctuation ratio,
    stopword ratio, average token length. One narrow pass."""
    w = words_col(F.col("text"))
    n_tokens = F.size(w)
    n_chars = F.length("text")
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", ""))
    n_stop = F.size(F.filter(w, lambda x: _in_list(x, EN_STOP)))
    return docs.select(
        "doc_id",
        "lang",
        "source",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_punct / n_chars).alias("punct_ratio"),
        F.when(n_tokens > 0, n_stop / n_tokens).alias("stopword_ratio"),
        F.when(n_tokens > 0, n_alpha / n_tokens).alias("avg_token_len"),
    )


def text_stats_oracle_sql() -> str:
    stop = ", ".join(f"'{s}'" for s in EN_STOP)
    return f"""
    SELECT doc_id, lang, source,
           length(text) AS n_chars,
           len({duck_words()}) AS n_tokens,
           length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) / length(text) AS punct_ratio,
           CASE WHEN len({duck_words()}) > 0 THEN
             len(list_filter({duck_words()}, x -> x IN ({stop}))) / len({duck_words()})
           END AS stopword_ratio,
           CASE WHEN len({duck_words()}) > 0 THEN
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / len({duck_words()})
           END AS avg_token_len
    FROM documents
    """


# ---------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish regex)
# ---------------------------------------------------------------------------

def token_counts(docs: DataFrame) -> DataFrame:
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
    return docs.select(
        "doc_id",
        ws.alias("n_tokens_ws"),
        bpe.alias("n_tokens_bpe"),
        F.length("text").alias("n_chars"),
    )


def token_counts_oracle_sql() -> str:
    return rf"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens_ws,
           len(regexp_extract_all(text, '{BPE_RE}')) AS n_tokens_bpe,
           length(text) AS n_chars
    FROM documents
    """


# ---------------------------------------------------------------------------
# Language ID (marker-word heuristic)
# ---------------------------------------------------------------------------

def lang_id(docs: DataFrame) -> DataFrame:
    """Deterministic n-gram-ish heuristic: score = count of language
    marker words; argmax with fixed priority order; 'und' if no
    markers hit. Compared against the labeled ``lang`` column."""
    w = words_col(F.col("text"))

    def _pred(markers: list[str]):
        # single-arg lambda: a second (default) arg would make F.filter
        # pass the element index into it
        return lambda x: _in_list(x, markers)

    scores = {
        lang: F.size(F.filter(w, _pred(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    order = list(LANG_MARKERS)
    guess = F.lit("und")
    # build the CASE chain back-to-front so earlier langs win ties
    for lang in reversed(order):
        cond = scores[lang] > 0
        for other in order:
            if other != lang and order.index(other) < order.index(lang):
                cond = cond & (scores[lang] > scores[other])
            elif other != lang:
                cond = cond & (scores[lang] >= scores[other])
        guess = F.when(cond, F.lit(lang)).otherwise(guess)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        guess.alias("guessed_lang"),
        (F.col("lang") == guess).alias("agrees"),
    )


def lang_id_oracle_sql() -> str:
    order = list(LANG_MARKERS)

    def score(lang: str) -> str:
        m = ", ".join(f"'{x}'" for x in LANG_MARKERS[lang])
        return f"len(list_filter(w, x -> x IN ({m})))"

    cases = []
    for lang in order:
        conds = [f"{score(lang)} > 0"]
        for other in order:
            if other == lang:
                continue
            op = ">" if order.index(other) < order.index(lang) else ">="
            conds.append(f"{score(lang)} {op} {score(other)}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return f"""
    SELECT doc_id, lang AS labeled_lang, {case_sql} AS guessed_lang,
           lang = ({case_sql}) AS agrees
    FROM (SELECT doc_id, lang, {duck_words()} AS w FROM documents)
    """


# ---------------------------------------------------------------------------
# Document fingerprinting (min-hash of word 5-gram shingles, winnowing-lite)
# ---------------------------------------------------------------------------

FP_SHINGLE = 5


def shingles_col(w: Column, n: int) -> Column:
    """Word n-gram shingles as strings; empty array when doc is shorter
    than one shingle.

    ``w`` is usually a raw expression (``regexp_extract_all`` over the
    text), and the naive form ``transform(sequence(..), i ->
    concat_ws(' ', slice(w, i, n)))`` inlines that expression into the
    lambda body — higher-order functions are interpreted, so the full
    tokenizer regex re-runs once PER SHINGLE INDEX per row (~50× per
    doc; a thread dump at 1M docs showed a task burning minutes inside
    RegExpExtractAll.nullSafeEval under ArrayTransform). Binding ``w``
    through a one-element ``transform`` makes it a lambda variable:
    evaluated exactly once per row by construction, immune to optimizer
    inlining, for every caller (minhash, Jaccard verify, fingerprint,
    decontamination)."""

    def shingle(wa: Column) -> Column:
        return F.when(
            F.size(wa) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(wa) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(wa, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(w), shingle), 1)


def duck_shingles(w: str, n: int) -> str:
    # range(start, stop) is empty when stop <= start — same guard shape
    return (
        f"CASE WHEN len({w}) >= {n} THEN "
        f"list_transform(range(1, len({w}) - {n - 2}), "
        f"i -> array_to_string({w}[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Rolling-hash fingerprint: minimum portable hash over the doc's
    word 5-gram shingles + distinct-shingle count."""
    docs = spread(docs)
    w = words_col(F.col("text"))
    sh = shingles_col(w, FP_SHINGLE)
    hashes = F.transform(sh, lambda s: portable_hash64(s))
    return docs.select(
        "doc_id",
        F.array_min(hashes).alias("fingerprint"),
        F.size(F.array_distinct(sh)).alias("n_shingles"),
    )


def doc_fingerprint_oracle_sql() -> str:
    sh = duck_shingles(duck_words(), FP_SHINGLE)
    return f"""
    SELECT doc_id,
           list_aggregate(list_transform({sh}, s -> {duck_hash64('s')}), 'min') AS fingerprint,
           len(list_distinct({sh})) AS n_shingles
    FROM documents
    """


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality rules)
# ---------------------------------------------------------------------------

def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-document repetition signals (the Gopher/MassiveText repetition
    filters): distinct-token ratio, most-frequent-token mass, and
    duplicate-bigram fraction. All per-row higher-order array ops —
    scan-bound, zero shuffle; cost is O(len·distinct) per doc, bounded
    by document length, independent of corpus size.

    The token array is materialized in a projection first — lambdas get
    no common-subexpression elimination, so inlining the regex pipeline
    into the nested count would re-tokenize per distinct token."""
    docs = spread(docs)
    base = docs.select(
        "doc_id",
        words_col(F.col("text")).alias("w"),
        shingles_col(words_col(F.col("text")), 2).alias("g2"),
    )
    w, g2 = F.col("w"), F.col("g2")
    top_count = F.array_max(
        F.transform(
            F.array_distinct(w),
            lambda t: F.size(F.filter(w, lambda x: x == t)),
        )
    )
    return base.where(F.size(w) > 0).select(
        "doc_id",
        F.size(w).alias("n_tokens"),
        (F.size(F.array_distinct(w)) / F.size(w)).alias("distinct_ratio"),
        (top_count / F.size(w)).alias("top_token_mass"),
        F.when(
            F.size(g2) > 0,
            F.lit(1.0) - F.size(F.array_distinct(g2)) / F.size(g2),
        ).otherwise(0.0).alias("dup_bigram_frac"),
    )


def repetition_stats_oracle_sql() -> str:
    w2 = duck_shingles("w", 2)
    return f"""
    WITH t AS (SELECT doc_id, {duck_words()} AS w FROM documents),
    b AS (SELECT doc_id, w, {w2} AS g2 FROM t WHERE len(w) > 0)
    SELECT doc_id, len(w) AS n_tokens,
           len(list_distinct(w)) / len(w) AS distinct_ratio,
           list_max(list_transform(list_distinct(w),
                t -> len(list_filter(w, x -> x = t)))) / len(w) AS top_token_mass,
           CASE WHEN len(g2) > 0
                THEN 1.0 - len(list_distinct(g2)) / len(g2)
                ELSE 0.0 END AS dup_bigram_frac
    FROM b
    """


# ---------------------------------------------------------------------------
# Training-chunk extraction: fixed-size token windows with stride
# ---------------------------------------------------------------------------

CHUNK_SIZE = 32
CHUNK_STRIDE = 16


def doc_chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_id, start_token, n_chunk_tokens, chunk_text) —
    sliding token windows of ``CHUNK_SIZE`` words advancing by
    ``CHUNK_STRIDE`` (the standard overlap-chunking used to cut long
    documents into training sequences). chunk count =
    1 + ceil((n - size)/stride), so the final chunk may be short but
    every token is covered exactly; empty docs yield no chunks.

    Pure Catalyst: one narrow scan, transform→explode fan-out — no
    shuffle at all; chunk rows land partition-local to their document,
    which is exactly what a downstream tokenizer wants.

    The slice happens INSIDE the ``transform`` lambda, before the
    explode: each exploded row carries only its own ≤CHUNK_SIZE tokens.
    Exploding the index first and slicing after would duplicate the full
    word array into every chunk row — O(n²/stride) bytes per document,
    which is the difference between linear and quadratic write volume on
    book-length documents."""
    docs = spread(docs)
    w = words_col(F.col("text"))
    base = docs.select("doc_id", w.alias("w"))
    n = F.size("w")
    n_chunks = F.when(
        n > 0,
        F.lit(1)
        + F.greatest(
            F.lit(0).cast("long"),
            F.ceil((n - F.lit(CHUNK_SIZE)) / F.lit(CHUNK_STRIDE)),
        ),
    ).otherwise(F.lit(0))
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).otherwise(
        F.array().cast("array<int>")
    )

    def chunk(i):
        start = F.lit(1) + i * F.lit(CHUNK_STRIDE)
        toks = F.slice(F.col("w"), start, F.lit(CHUNK_SIZE))
        return F.struct(
            i.alias("chunk_id"),
            start.alias("start_token"),
            F.size(toks).alias("n_chunk_tokens"),
            F.concat_ws(" ", toks).alias("chunk_text"),
        )

    return base.select(
        "doc_id", F.explode(F.transform(idx, chunk)).alias("c")
    ).select("doc_id", "c.chunk_id", "c.start_token", "c.n_chunk_tokens", "c.chunk_text")


def doc_chunks_oracle_sql() -> str:
    c, s = CHUNK_SIZE, CHUNK_STRIDE
    sl = f"w[(1 + i*{s}):(i*{s} + {c})]"
    return f"""
    WITH t AS (SELECT doc_id, {duck_words()} AS w FROM documents),
    n AS (SELECT doc_id, w,
                 CASE WHEN len(w) > 0 THEN
                   1 + greatest(0, CAST(ceil((len(w) - {c}) / {s}.0) AS BIGINT))
                 ELSE 0 END AS n_chunks
          FROM t)
    SELECT doc_id, i AS chunk_id, 1 + i*{s} AS start_token,
           len({sl}) AS n_chunk_tokens,
           array_to_string({sl}, ' ') AS chunk_text
    FROM n, UNNEST(range(0, n_chunks)) u(i)
    """


# ---------------------------------------------------------------------------
# Dictionary encoding: frequency-ranked vocabulary + per-doc id arrays
# ---------------------------------------------------------------------------

def vocab_encode(docs: DataFrame, min_count: int = 1) -> DataFrame:
    """(doc_id, n_tokens, ids) — the tokenize→vocab→encode step of a
    training pipeline: build a corpus vocabulary (id = rank by global
    frequency desc, then word asc — id 1 is the most frequent word) and
    re-emit every document as its token-id sequence.

    The vocab rank is a GLOBAL order (frequency desc, word asc) but is
    computed without a single-partition sort: the vocab is
    range-partitioned on the rank key (a parallel sort — skewed
    frequency ties like the cnt=1 tail split across partitions by word
    range), each partition ranks its own rows, and the global id is
    that local rank plus the preceding partitions' row counts — the
    offsets frame is one row per partition, bounded by cluster config,
    not by data. Contiguous ranges make offset+local-rank equal the
    global row_number exactly, independent of where the (sampled) range
    boundaries land, because (cnt, word) is a total order. The encode
    join broadcasts the vocab, and the id arrays are re-assembled with
    one shuffle on doc_id (array_sort over (pos, id) structs restores
    token order without a per-group sort pass). At true web scale the
    distinct-word set itself explodes (typos, ids, code) — that is what
    ``min_count`` is for: the frequency cutoff runs BEFORE the rank, so
    ranking covers only the kept vocabulary. Out-of-vocabulary tokens
    drop out of ``ids`` (and out of ``n_tokens``) — the standard
    OOV-drop encode; docs of only OOV tokens drop entirely."""
    from pyspark.sql import Window

    docs = spread(docs)
    tok = docs.select(
        "doc_id", F.posexplode(words_col(F.col("text"))).alias("pos", "word")
    )
    vocab = tok.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    if min_count > 1:
        vocab = vocab.where(F.col("cnt") >= min_count)
    # CORRECTNESS PIN: the offsets side and the join side must see the
    # SAME partition boundaries. Two syntactically identical range
    # exchanges are NOT guaranteed to agree — RangePartitioner seeds
    # its boundary sampling by RDD id, so independent physical subtrees
    # can sample different boundaries once the vocab outgrows the
    # per-partition sample budget (it only coincided on small corpora,
    # where sampling degenerates to the full set). localCheckpoint
    # materializes the ranged frame once; both consumers scan that one
    # RDD, so `_p` means the same row set on both sides
    # (tests/test_plans.py::test_vocab_encode_single_range_exchange).
    ranged = (
        vocab.repartitionByRange(F.desc("cnt"), F.asc("word"))
        .withColumn("_p", F.spark_partition_id())
        .localCheckpoint(eager=False, storageLevel=_SER)
    )
    sizes = ranged.groupBy("_p").agg(F.count(F.lit(1)).alias("_n"))
    woff = Window.orderBy("_p").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "_p", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")
    )
    local_rk = F.row_number().over(
        Window.partitionBy("_p").orderBy(F.desc("cnt"), F.asc("word"))
    )
    vocab_ids = (
        ranged.join(F.broadcast(offsets), "_p")
        .select("word", (F.col("_off") + local_rk).cast("int").alias("id"))
    )
    return (
        tok.join(F.broadcast(vocab_ids), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "id"))),
                lambda x: x["id"],
            ).alias("ids"),
        )
    )


def vocab_encode_oracle_sql() -> str:
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(w) AS word, unnest(range(1, len(w) + 1)) AS pos
        FROM (SELECT doc_id, {duck_words()} AS w FROM documents)
    ),
    vocab AS (SELECT word, count(*) AS cnt FROM tok GROUP BY 1),
    ids AS (SELECT word,
                   row_number() OVER (ORDER BY cnt DESC, word) AS id
            FROM vocab)
    SELECT doc_id, count(*) AS n_tokens, list(id ORDER BY pos) AS ids
    FROM tok JOIN ids USING (word)
    GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# Winnowing (Schleimer et al. '03): distinct per-window minima of the
# rolling shingle hashes — the local fingerprint set that guarantees
# any shared run of ≥ w+n-1 words between two docs shares a fingerprint
# ---------------------------------------------------------------------------

WINNOW_W = 8


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — winnowed fingerprint set per document.

    All per-row higher-order array ops (shingle → hash → sliding-window
    min → distinct → explode). The hash array is materialized as its
    own projection first: expressions inside higher-order lambdas get
    no common-subexpression elimination, so referencing the raw
    shingle→sha256 pipeline from the per-window lambda would recompute
    it per window — O(n²) hashing (measured 18× slower). Docs shorter
    than one window fall back to their global min hash (the standard
    winnowing degenerate case)."""
    docs = spread(docs)
    w = words_col(F.col("text"))
    hashed = docs.select(
        "doc_id",
        F.transform(shingles_col(w, FP_SHINGLE), lambda s: portable_hash64(s)).alias("th"),
    )
    th = F.col("th")
    wins = F.transform(
        F.sequence(F.lit(1), F.size(th) - (WINNOW_W - 1)),
        lambda i: F.array_min(F.slice(th, i, WINNOW_W)),
    )
    fps = (
        F.when(F.size(th) >= WINNOW_W, F.array_distinct(wins))
        .when(F.size(th) > 0, F.array(F.array_min(th)))
        .otherwise(F.array().cast("array<long>"))
    )
    return hashed.select("doc_id", F.explode(fps).alias("fp"))


def winnow_fingerprints_oracle_sql() -> str:
    th = f"list_transform({duck_shingles(duck_words(), FP_SHINGLE)}, s -> {duck_hash64('s')})"
    return f"""
    WITH t AS (SELECT doc_id, {th} AS th FROM documents),
    w AS (
        SELECT doc_id,
               CASE WHEN len(th) >= {WINNOW_W} THEN
                      list_distinct(list_transform(
                          range(1, len(th) - {WINNOW_W - 2}),
                          i -> list_aggregate(th[i:i+{WINNOW_W - 1}], 'min')))
                    WHEN len(th) > 0 THEN [list_aggregate(th, 'min')]
                    ELSE [] END AS fps
        FROM t
    )
    SELECT doc_id, fp FROM w, UNNEST(fps) u(fp)
    """


# ---------------------------------------------------------------------------
# Sequence packing: chunks → fixed-budget training sequences (the step
# between chunking and the tokenizer/dataloader — T5/GPT-style packing
# amortizes padding by concatenating short pieces up to a token budget)
# ---------------------------------------------------------------------------

PACK_BUDGET = 128  # tokens per packed training sequence
PACK_SHARDS = 8    # packing parallelism within a language


def pack_sequences(docs: DataFrame, n_tokens: str | None = None) -> DataFrame:
    """(lang, shard, seq_id, n_chunks, n_tokens) — deterministic greedy
    packing of document chunks into fixed-budget training sequences.

    Chunks (the doc_chunks sliding windows) are taken in (doc_id,
    chunk_id) order inside each (lang, shard) group; a chunk joins the
    sequence its running token offset falls in
    (``seq_id = floor(cum_tokens_before / BUDGET)``) — in-order
    first-fit where chunks never split, so a sequence can overshoot the
    budget by at most one chunk tail (the standard concat-then-cut
    packing admits the same slack at the cut points).

    Scale shape: the only shuffle is the (lang, shard) window partition;
    ``shard = hash(doc_id) % PACK_SHARDS`` bounds every window partition
    to 1/shards of a language, so no single task ever sorts a whole
    language — packing is embarrassingly parallel across shards by
    construction (each shard's sequences are independent, exactly like
    per-file packing in a real dataloader). Chunk *lengths* are computed
    arithmetically from the doc's token count — the chunk text is never
    materialized or shuffled.

    ``n_tokens``: name of a pre-computed token-COUNT column — composed
    pipelines that already tokenized upstream (corpus_pipeline_full
    pins the words array once) pass it to spare this stage its own
    regex pass over ``text``.
    """
    docs = spread(docs)
    from pyspark.sql import Window

    n = F.col(n_tokens) if n_tokens else F.size(words_col(F.col("text")))
    base = docs.select(
        "doc_id",
        "lang",
        n.alias("n"),
        (portable_hash64(F.concat(F.lit("shard:"), F.col("doc_id"))) % PACK_SHARDS)
        .cast("int")
        .alias("shard"),
    )
    n_chunks = F.when(
        F.col("n") > 0,
        F.lit(1)
        + F.greatest(
            F.lit(0).cast("long"),
            F.ceil((F.col("n") - F.lit(CHUNK_SIZE)) / F.lit(CHUNK_STRIDE)),
        ),
    ).otherwise(F.lit(0))
    idx = F.when(
        n_chunks > 0, F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    chunks = base.select(
        "doc_id", "lang", "shard", "n", F.explode(idx).alias("chunk_id")
    ).select(
        "doc_id",
        "lang",
        "shard",
        "chunk_id",
        F.least(
            F.lit(CHUNK_SIZE).cast("long"),
            F.col("n") - F.col("chunk_id") * F.lit(CHUNK_STRIDE),
        ).alias("chunk_tokens"),
    )
    w = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("chunk_tokens").over(w), F.lit(0))
    packed = chunks.withColumn(
        "seq_id", F.floor(cum_before / F.lit(PACK_BUDGET)).cast("long")
    )
    return packed.groupBy("lang", "shard", "seq_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_tokens").alias("n_tokens"),
    )


def pack_sequences_oracle_ctes(source: str = "documents") -> str:
    """The packing CTE chain over ``source`` (a table or prior CTE),
    ending in ``packed`` — split out so composed pipelines can append
    it to their own WITH chain."""
    shard_hash = duck_hash64("'shard:' || doc_id")
    shard = f"CAST({shard_hash} % {PACK_SHARDS} AS INTEGER)"
    c, s = CHUNK_SIZE, CHUNK_STRIDE
    return f"""
    pk_base AS (
        SELECT doc_id, lang, len({duck_words()}) AS n, {shard} AS shard
        FROM {source}
    ),
    nc AS (
        SELECT *, CASE WHEN n > 0 THEN
                    1 + greatest(0, CAST(ceil((n - {c}) / {s}.0) AS BIGINT))
                  ELSE 0 END AS n_chunks
        FROM pk_base
    ),
    chunks AS (
        SELECT doc_id, lang, shard, i AS chunk_id,
               least({c}, n - i * {s}) AS chunk_tokens
        FROM nc, UNNEST(range(0, n_chunks)) u(i)
    ),
    packed AS (
        SELECT lang, shard,
               CAST(floor(coalesce(sum(chunk_tokens) OVER (
                   PARTITION BY lang, shard ORDER BY doc_id, chunk_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {PACK_BUDGET}) AS BIGINT) AS seq_id,
               chunk_tokens
        FROM chunks
    )
    """


PACK_FINAL_SELECT = """
    SELECT lang, shard, seq_id, count(*) AS n_chunks,
           -- CAST: sum() over integers is HUGEINT in DuckDB -> float64 in
           -- pandas -> '128.0' vs Spark's '128' under the driver string hash
           CAST(sum(chunk_tokens) AS BIGINT) AS n_tokens
    FROM packed GROUP BY 1, 2, 3
    """


def pack_sequences_oracle_sql(source: str = "documents") -> str:
    return f"WITH {pack_sequences_oracle_ctes(source)} {PACK_FINAL_SELECT}"


# ---------------------------------------------------------------------------
# Composed quality filter (C4/Gopher-style keep/drop rules) and PII scrub
# ---------------------------------------------------------------------------

QF_MIN_TOKENS = 10
QF_MAX_PUNCT = 0.25
QF_MIN_DISTINCT = 0.4

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"


def quality_keep(text: Column) -> Column:
    """The WHERE-form of :func:`quality_filter`'s keep rule — the same
    three C4/Gopher-style gates as one boolean the composed pipelines
    (operators/dedup.corpus_pipeline*) filter the scan with directly,
    so the quality stage costs zero extra passes. NULL semantics match
    the oracle SQL's ``WHERE n >= … AND NOT(punct > …) AND NOT(…)``
    conjunction exactly (a NULL gate fails the row on both engines).

    FUSED (round 10, the shingles_col trick): the tokenizer array and
    the punct-strip scan are bound through a one-element ``transform``
    so every gate reads lambda variables — one regex tokenize and one
    punct pass per row BY CONSTRUCTION, immune to the optimizer
    duplicating them across filter/project boundaries (FilterExec's
    codegen has no cross-reference subexpression elimination for the
    three gates' shared ``w``). Interleaved A/B at sf0.1: 0.40 →
    0.30 s for the gate-filtered count, identical survivors."""
    w = words_col(text)
    punct_ratio = (
        F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", "")) / F.length(text)
    )
    gates = F.transform(
        F.array(F.struct(w.alias("w"), punct_ratio.alias("p"))),
        lambda s: (
            (F.size(s["w"]) >= QF_MIN_TOKENS)
            & ~(s["p"] > QF_MAX_PUNCT)
            & ~(
                F.when(
                    F.size(s["w"]) > 0,
                    F.size(F.array_distinct(s["w"])) / F.size(s["w"]),
                ).otherwise(F.lit(0.0))
                < QF_MIN_DISTINCT
            )
        ),
    )
    return F.element_at(gates, 1)


def quality_filter(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, keep, reasons) — the composed keep/drop
    decision every cleaning pipeline ends with: C4/Gopher-style rules
    (min length, punctuation mass, distinct-token ratio) evaluated in
    one narrow pass; ``reasons`` names every failed rule so drops are
    auditable. Zero shuffle; rules are plain codegen'd expressions, so
    adding one is adding a CASE, not a pass."""
    docs = spread(docs)
    w = words_col(F.col("text"))
    n_tokens = F.size(w)
    punct_ratio = (
        F.length(F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", ""))
        / F.length("text")
    )
    distinct_ratio = F.when(
        n_tokens > 0, F.size(F.array_distinct(w)) / n_tokens
    ).otherwise(F.lit(0.0))
    reasons = F.concat_ws(
        ",",
        F.when(n_tokens < QF_MIN_TOKENS, F.lit("too_short")),
        F.when(punct_ratio > QF_MAX_PUNCT, F.lit("too_much_punct")),
        F.when(distinct_ratio < QF_MIN_DISTINCT, F.lit("repetitive")),
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def quality_filter_oracle_sql() -> str:
    w = duck_words()
    n = f"len({w})"
    punct = r"length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) / length(text)"
    distinct = f"CASE WHEN {n} > 0 THEN len(list_distinct({w})) / {n} ELSE 0.0 END"
    return f"""
    SELECT doc_id, {n} AS n_tokens,
           concat_ws(',',
               CASE WHEN {n} < {QF_MIN_TOKENS} THEN 'too_short' END,
               CASE WHEN {punct} > {QF_MAX_PUNCT} THEN 'too_much_punct' END,
               CASE WHEN {distinct} < {QF_MIN_DISTINCT} THEN 'repetitive' END
           ) AS reasons,
           concat_ws(',',
               CASE WHEN {n} < {QF_MIN_TOKENS} THEN 'too_short' END,
               CASE WHEN {punct} > {QF_MAX_PUNCT} THEN 'too_much_punct' END,
               CASE WHEN {distinct} < {QF_MIN_DISTINCT} THEN 'repetitive' END
           ) = '' AS keep
    FROM documents
    """


def pii_scrub(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_phones, clean_text) — regex PII redaction
    (emails, phone-number-shaped digit runs) with per-doc counts, the
    standard pre-training scrub pass. Patterns are dialect-portable
    (valid and equivalent under Java regex and RE2). Per-row regex over
    the scan — zero shuffle, scales with input bytes."""
    docs = spread(docs)
    emails = F.size(F.regexp_extract_all(F.col("text"), F.lit(EMAIL_RE), 0))
    no_email = F.regexp_replace(F.col("text"), EMAIL_RE, "[EMAIL]")
    phones = F.size(F.regexp_extract_all(no_email, F.lit(PHONE_RE), 0))
    clean = F.regexp_replace(no_email, PHONE_RE, "[PHONE]")
    return docs.select(
        "doc_id",
        emails.alias("n_emails"),
        phones.alias("n_phones"),
        clean.alias("clean_text"),
    )


def pii_scrub_oracle_sql() -> str:
    email = EMAIL_RE.replace("'", "''")
    phone = PHONE_RE.replace("'", "''")
    no_email = f"regexp_replace(text, '{email}', '[EMAIL]', 'g')"
    return f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{email}')) AS n_emails,
           len(regexp_extract_all({no_email}, '{phone}')) AS n_phones,
           regexp_replace({no_email}, '{phone}', '[PHONE]', 'g') AS clean_text
    FROM documents
    """


# ---------------------------------------------------------------------------
# Exact repeated-span detection (substring-level dedup)
# ---------------------------------------------------------------------------

SPAN_LEN = 8  # words per span; Lee et al. use 50 BPE tokens — same shape


def span_dedup(docs: DataFrame, k: int = SPAN_LEN) -> DataFrame:
    """(doc_id, n_spans, n_dup_spans, dup_frac) — exact repeated-span
    detection, the distributed shape of suffix-array substring dedup
    (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better"): any word 8-gram span that occurs in >= 2 distinct
    documents is duplicated text; per-doc totals plus the duplicated
    fraction feed a drop/trim policy downstream.

    Plan shape: spans are distinct per doc (``array_distinct``) so a
    count over the span partition equals the distinct-document count —
    ONE shuffle on the span key (window count, no join against a
    separate duplicate set), then one groupBy doc_id. The shuffle key
    is the 60-bit ``portable_hash64(span)`` — 8-byte longs cross the
    exchange, never k-word strings (the Lee et al. practice; a hash
    collision merely merges two spans' counts, odds ~n²/2^61) — and the
    oracle groups on the identical ``duck_hash64`` value, so the
    hashed key is itself oracle-checked. Plan contract:
    tests/test_plans.py::test_span_shuffle_keys_are_hashed. No
    reference analogue (the reference has no text operators at all)."""
    from pyspark.sql import Window

    docs = spread(docs)
    w = words_col(F.col("text"))
    sp = docs.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(
                F.transform(shingles_col(w, k), lambda s: portable_hash64(s))
            )
        ).alias("span_h"),
    )
    n_docs_for_span = F.count(F.lit(1)).over(Window.partitionBy("span_h"))
    marked = sp.select(
        "doc_id", "span_h", (n_docs_for_span >= 2).cast("int").alias("is_dup")
    )
    n_spans = F.count("span_h")  # non-null only: empty docs keep 0
    n_dup = F.sum(F.when(F.col("span_h").isNotNull(), F.col("is_dup")).otherwise(0))
    return (
        marked.groupBy("doc_id")
        .agg(n_spans.alias("n_spans"), n_dup.alias("n_dup_spans"))
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            F.when(
                F.col("n_spans") > 0,
                F.col("n_dup_spans").cast("double") / F.col("n_spans"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )


def span_dedup_oracle_sql() -> str:
    spans = (
        f"list_distinct(list_transform({duck_shingles(duck_words(), SPAN_LEN)}, "
        f"s -> {duck_hash64('s')}))"
    )
    return f"""
    WITH sp AS (
        SELECT doc_id, unnest({spans}) AS span FROM documents
    ),
    c AS (
        SELECT doc_id, span, count(*) OVER (PARTITION BY span) AS n_docs FROM sp
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_spans,
               sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS n_dup_spans
        FROM c GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(agg.n_spans, 0) AS n_spans,
           -- CAST: sum() over integers is HUGEINT in DuckDB -> float64 in
           -- pandas -> '0.0' vs Spark's '0' under the driver's string hash
           CAST(coalesce(agg.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CASE WHEN coalesce(agg.n_spans, 0) > 0
                THEN CAST(agg.n_dup_spans AS DOUBLE) / agg.n_spans
                ELSE 0.0 END AS dup_frac
    FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """


def span_removal(docs: DataFrame, k: int = SPAN_LEN) -> DataFrame:
    """(doc_id, n_words, n_removed, cleaned_text) — actually EXCISE
    duplicated spans, not just flag them (Lee et al. 2021 §3: of every
    substring duplicated across the corpus, one occurrence is kept and
    the rest are removed).

    Deterministic word-level model: every k-word span occurrence is
    ranked globally by (doc_id, start_pos); the first occurrence of
    each distinct span survives, every later occurrence is excised —
    each of its k word positions is dropped from its document — and the
    text is reconstructed from the surviving words. First-occurrence-
    wins makes the result independent of execution order, and word
    granularity keeps the reconstruction exactly reproducible in the
    SQL oracle (suffix-array byte ranges would not be).

    Plan shape: ONE shuffle partitions span occurrences by the 60-bit
    ``portable_hash64(span)`` — 8-byte longs cross the exchange, never
    k-word strings (same hashed key as span_dedup; a collision merges
    two spans' occurrence lists, excising a first occurrence it should
    have kept — odds ~n²/2^61, the accepted Lee-et-al trade) — and the
    oracle ranks over the identical ``duck_hash64`` value, so the
    hashed key is itself oracle-checked. Excised occurrences explode
    to ≤ k·|occurrences| (doc_id, pos) rows which aggregate per doc
    into a removal-position set; the rebuild is then a per-row array
    filter — document text is never exploded word-by-word or
    shuffled."""
    from pyspark.sql import Window

    docs = spread(docs)
    w = words_col(F.col("text"))
    occ = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(shingles_col(w, k), lambda s: portable_hash64(s))
        ).alias("p", "span_h"),
    )
    rn = F.row_number().over(
        Window.partitionBy("span_h").orderBy("doc_id", "p")
    )
    excised = occ.withColumn("rn", rn).where(F.col("rn") > 1)
    cover = excised.select(
        "doc_id",
        F.explode(F.sequence(F.col("p"), F.col("p") + F.lit(k - 1))).alias("pos"),
    )
    removed = cover.groupBy("doc_id").agg(F.collect_set("pos").alias("rm"))
    base = docs.select("doc_id", w.alias("ws"))
    joined = base.join(removed, "doc_id", "left").withColumn(
        "rm", F.coalesce(F.col("rm"), F.array().cast("array<int>"))
    )
    kept_words = F.filter(
        F.col("ws"), lambda x, i: ~F.array_contains(F.col("rm"), i.cast("int"))
    )
    return joined.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.size("rm").alias("n_removed"),
        F.array_join(kept_words, " ").alias("cleaned_text"),
    )


def span_removal_oracle_sql(k: int = SPAN_LEN, source: str = "documents") -> str:
    spans = duck_shingles(duck_words(), k)
    h = duck_hash64("s")
    return f"""
    WITH occ AS (
        SELECT doc_id, o.p, o.span_h
        FROM (SELECT doc_id, unnest(list_transform({spans},
                  (s, i) -> struct_pack(p := i - 1, span_h := {h}))) AS o
              FROM {source})
    ),
    ranked AS (
        SELECT doc_id, p,
               row_number() OVER (PARTITION BY span_h ORDER BY doc_id, p) AS rn
        FROM occ
    ),
    cover AS (
        SELECT DISTINCT doc_id, p + i AS pos
        FROM ranked, UNNEST(range(0, {k})) u(i)
        WHERE rn > 1
    ),
    removed AS (
        SELECT doc_id, list(pos) AS rm FROM cover GROUP BY doc_id
    )
    SELECT d.doc_id,
           len({duck_words()}) AS n_words,
           coalesce(len(rm), 0) AS n_removed,
           -- coalesce: DuckDB array_to_string of an empty list is NULL,
           -- Spark array_join is '' — a fully-excised doc must agree
           coalesce(array_to_string(list_filter({duck_words()},
               (x, i) -> NOT coalesce(list_contains(rm, i - 1), FALSE)), ' '), '')
               AS cleaned_text
    FROM {source} d LEFT JOIN removed ON d.doc_id = removed.doc_id
    """


# ---------------------------------------------------------------------------
# Compression-ratio quality signal (zlib; the genuine Python path)
# ---------------------------------------------------------------------------

def compression_ratio(docs: DataFrame) -> DataFrame:
    """(doc_id, n_raw, n_compressed, ratio) — zlib compression ratio
    per document, the Gopher/RefinedWeb "too compressible = boilerplate,
    too incompressible = noise" quality signal.

    This is the one text operator that genuinely needs Python (no zlib
    in Catalyst or DuckDB), so it takes the sanctioned slow path:
    ``mapInPandas`` over Arrow batches — per-batch vectorized encode,
    no row-at-a-time UDF, memory bounded by batch size not partition
    size. No oracle (``driver_facing=False``); semantics are pinned
    against direct ``zlib`` calls in tests/test_new_dedup.py.

    Scale: scan-bound, zero shuffle; compression cost ~30 MB/s/core ×
    whatever the scan feeds — the same profile as the multimodal decode
    stubs (operators/multimodal.py)."""
    import pandas as pd

    def _batches(it):
        import zlib

        for pdf in it:
            raw = pdf["text"].fillna("").str.encode("utf-8")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_raw": raw.str.len(),
                    "n_compressed": raw.apply(lambda b: len(zlib.compress(b, 6))),
                }
            )

    out = docs.select("doc_id", "text").mapInPandas(
        _batches, "doc_id long, n_raw long, n_compressed long"
    )
    return out.select(
        "doc_id",
        "n_raw",
        "n_compressed",
        F.when(
            F.col("n_raw") > 0, F.col("n_compressed").cast("double") / F.col("n_raw")
        )
        .otherwise(F.lit(0.0))
        .alias("ratio"),
    )


# ---------------------------------------------------------------------------
# Corpus-frequency document scoring: mean global token probability
# ---------------------------------------------------------------------------

def unigram_freq_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_token_freq) — per-document mean of each
    token's global corpus probability (KenLM-style unigram scoring with
    the log dropped so the math stays exact): gibberish/OCR noise is
    made of globally-rare tokens and scores near 0; boilerplate made of
    stock words scores high. The standard corpus-relative twin of the
    doc-local signals in :func:`text_stats`.

    Determinism: everything is integer until the END — per-token corpus
    counts (exact), per-doc sum of those counts (exact) — then exactly
    two IEEE double divisions (sum/n)/total, applied in the same order
    in both engines. No log, no cross-row double accumulation, so the
    result is bit-identical regardless of partitioning.

    Scale: one tokenize+explode scan, one groupBy(word) building the
    frequency table (map-side partials; vocab-sized result), one
    word-keyed join back (AQE broadcasts the vocab side when it fits —
    natural-language vocabularies are tiny next to the token stream),
    one doc-keyed agg. Zipfian word skew is absorbed by the map-side
    combine in the frequency agg; the join side carries one row per
    token occurrence regardless.  Empty docs have no tokens and drop
    out (both engines identically)."""
    docs = spread(docs)
    tok = docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("word"))
    freq = tok.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("total"))
    per_doc = (
        tok.join(freq, "word")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("s"), F.count(F.lit(1)).alias("n_tokens"))
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_tokens",
        (F.col("s").cast("double") / F.col("n_tokens") / F.col("total"))
        .alias("avg_token_freq"),
    )


def unigram_freq_score_oracle_sql() -> str:
    w = duck_words()
    return f"""
    WITH t AS (SELECT doc_id, unnest({w}) AS word FROM documents),
    f AS (SELECT word, count(*) AS cnt FROM t GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM f),
    d AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS s, count(*) AS n_tokens
          FROM t JOIN f USING (word) GROUP BY 1)
    SELECT doc_id, n_tokens,
           CAST(s AS DOUBLE) / n_tokens / total AS avg_token_freq
    FROM d, tot
    """


# Fixed-point scale for the bigram conditional: floor(c2·10^9 / c1)
# stays exact in int64 (c2 ≤ corpus tokens < 9.2e9 before overflow)
BIGRAM_SCALE = 1_000_000_000
# c2 · BIGRAM_SCALE must stay inside int64; counts past this wrap
# silently and corrupt scores, so the score expression raises instead
_BIGRAM_C2_MAX = (2**63 - 1) // BIGRAM_SCALE


def bigram_lm_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, avg_bigram_cond) — per-document mean
    corpus-conditional bigram probability ``P(w_i | w_{i-1}) =
    c(w_{i-1} w_i) / c(w_{i-1})``, the order-2 fluency signal CCNet-
    style pipelines (Wenzek et al. 2020) use LM perplexity for, one
    order up from :func:`unigram_freq_score`: a doc whose word PAIRS
    never co-occur elsewhere (shuffled text, OCR noise, keyword stuffing
    — all invisible to unigram frequency) scores near its own
    self-count floor, while natural prose rides the corpus's common
    transitions. No smoothing needed: every scored bigram occurs at
    least once (itself), so the conditional is always positive.

    Determinism (same contract as unigram_freq_score): per-occurrence
    ``q = floor(c2 · 10^9 / c1)`` is exact int64 in both engines,
    per-doc sums stay int64, and the single final IEEE division
    ``sum/n`` is applied identically — no log, no cross-row double
    accumulation. ``c1`` is the word's TOTAL occurrence count (not
    prefix-position count) — documented choice, mirrored in the oracle.

    Scale: one tokenize scan emitting bigrams per-row (zip of the
    word array with its own tail — the pair list never shuffles), one
    bigram groupBy and one unigram groupBy (both map-side combined,
    vocab-sized results), two joins back (AQE broadcasts the count
    tables when they fit — the tfidf/unigram shape), one doc-keyed
    agg. Docs with <2 tokens emit n_bigrams=0, score 0.0."""
    docs = spread(docs)
    w = words_col(F.col("text"))
    # bigrams ARE 2-shingles — reuse the shared n-gram helper (same
    # space-join, same short-doc empty-array guard)
    big = docs.select("doc_id", F.explode(shingles_col(w, 2)).alias("bg")).withColumn(
        "w1", F.substring_index(F.col("bg"), " ", 1)
    )
    c2 = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    tok = docs.select(F.explode(words_col(F.col("text"))).alias("w1"))
    c1 = tok.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    q = (
        big.join(c2, "bg")
        .join(c1, "w1")
        # int64 guard inside the same distributed expression (no extra
        # pass): a bigram occurring ≥ ~9.2e9 times — plausible at the
        # 100-TB scale this module targets — would overflow c2·10^9;
        # fail loudly rather than emit wrapped scores. A corpus that
        # trips this should drop BIGRAM_SCALE (documented precision
        # trade), not widen silently.
        .select(
            "doc_id",
            F.expr(
                f"CASE WHEN c2 <= {_BIGRAM_C2_MAX} "
                f"THEN c2 * {BIGRAM_SCALE} div c1 "
                f"ELSE raise_error(concat('bigram_lm_score: corpus bigram "
                f"count ', c2, ' overflows the 10^9 fixed-point scale "
                f"(max {_BIGRAM_C2_MAX})')) END"
            ).alias("q"),
        )
    )
    agg = q.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("q").alias("sq")
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.when(
                F.col("n_bigrams") > 0,
                F.col("sq").cast("double")
                / F.col("n_bigrams")
                / F.lit(float(BIGRAM_SCALE)),
            )
            .otherwise(F.lit(0.0))
            .alias("avg_bigram_cond"),
        )
    )


def bigram_lm_score_oracle_sql() -> str:
    w = duck_words()
    sh2 = duck_shingles(w, 2)
    return f"""
    WITH big AS (
        SELECT doc_id, bg, split_part(bg, ' ', 1) AS w1
        FROM (SELECT doc_id, unnest({sh2}) AS bg FROM documents)
    ),
    c2 AS (SELECT bg, count(*) AS c2 FROM big GROUP BY 1),
    c1 AS (SELECT w1, count(*) AS c1
           FROM (SELECT unnest({w}) AS w1 FROM documents) GROUP BY 1),
    q AS (
        SELECT doc_id, (c2.c2 * {BIGRAM_SCALE}) // c1.c1 AS q
        FROM big JOIN c2 USING (bg) JOIN c1 USING (w1)
    ),
    agg AS (
        SELECT doc_id, count(*) AS n_bigrams, CAST(sum(q) AS BIGINT) AS sq
        FROM q GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CASE WHEN coalesce(agg.n_bigrams, 0) > 0
                THEN CAST(agg.sq AS DOUBLE) / agg.n_bigrams
                     / {BIGRAM_SCALE}.0
                ELSE 0.0 END AS avg_bigram_cond
    FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
    """
