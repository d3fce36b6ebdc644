"""Corpus selection for training-data pipelines: DSIR-style importance
weighting and token-budget curation.

The reference engine syncs documents verbatim; a 100-TB training
pipeline additionally has to DECIDE which documents to keep. Two
published selection shapes are implemented here Spark-first:

- :func:`dsir_weights` — hashed-n-gram importance weights in the shape
  of DSIR (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): bag-of-hashed-ngram features, a target-vs-
  raw frequency model with add-one smoothing over the hashed bucket
  space, one weight per document. The published estimator exponentiates
  a sum of per-feature log-ratios; cross-engine log-sums are not
  bit-reproducible (libm vs JVM transcendentals), so the weight here is
  the LINEARIZED twin — the ratio of the document's smoothed target
  feature mass to its smoothed raw feature mass, normalized by the
  corpus-level masses. Every aggregate stays in exact int64; the weight
  is derived by a fixed three-op IEEE tail (div, mul, div) applied
  identically in both engines, so the driver value-hash is stable.
- :func:`dsir_select` — deterministic importance selection: top
  ``fraction`` of each language partition by weight (total order:
  weight desc, doc_id asc). The paper's Gumbel-top-k sampler perturbs
  the sort key with log-transformed uniforms; the transcendental again
  breaks cross-engine determinism, so selection is by the weight rank
  itself (the fraction-quantile shape production pipelines use).
- :func:`budget_select` — token-budget curation: per language, rank
  documents by an integer fixed-point quality key (distinct-token
  ratio — the Gopher repetition signal inverted into a selection key)
  and keep documents while the running token total fits the budget.
  All-integer, so exact everywhere.

Scale notes (100 TB): the feature-frequency table is bounded by the
hashed bucket space (``DSIR_BUCKETS`` rows after the groupBy — map-side
partials absorb the Zipfian feature skew), so the join back to the
token stream is a guaranteed broadcast; the only wide shuffle is the
final doc_id aggregation. The two window operators partition by
``lang`` — at petabyte scale a language is still too wide for one
window partition, so production would first derive the per-lang weight
threshold / budget cutoff with ``approxQuantile`` and filter by it
(same result modulo boundary ties); the exact window form is the
oracle-checkable contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from meilisync_spark.functions.hashing import portable_hash64, duck_hash64
from meilisync_spark.operators.dedup import dedup_clusters, dedup_clusters_oracle_sql
from meilisync_spark.operators.sampling import SPLIT_TRAIN, SPLIT_VAL
from meilisync_spark.operators.text import (
    duck_shingles,
    duck_words,
    shingles_col,
    words_col,
)
from meilisync_spark.sources.parquet import spread
from meilisync_spark.pin import SER as _SER

# Hashed feature space (unigrams + word bigrams share it, as in the
# DSIR reference implementation). 1024 buckets keeps the frequency
# table broadcastable by construction at any corpus size.
DSIR_BUCKETS = 1024

# Fixed-point scale for the distinct-token-ratio selection key:
# n_distinct * SCALE / n_tokens stays exact in int64 for any document
# below ~9e12 distinct tokens.
RATIO_SCALE = 1_000_000

DSIR_SELECT_FRACTION = 0.25
TOKEN_BUDGET = 2_000


def _features_col(w: Column) -> Column:
    """Hashed unigram + word-bigram feature ids (0..DSIR_BUCKETS-1)."""
    feats = F.concat(w, shingles_col(w, 2))
    return F.transform(feats, lambda s: F.pmod(portable_hash64(s), F.lit(DSIR_BUCKETS)))


def _duck_features(w: str) -> str:
    return (
        f"list_transform(list_concat({w}, {duck_shingles(w, 2)}), "
        f"s -> {duck_hash64('s')} % {DSIR_BUCKETS})"
    )


def dsir_weights(docs: DataFrame, target: Column | None = None) -> DataFrame:
    """(doc_id, n_feats, t_mass, r_mass, weight) — importance weight of
    every document against a target distribution.

    ``target`` is a boolean Column over ``docs`` marking the target
    subset (default: ``lang = 'en'``). Features are hashed unigrams and
    word bigrams; with add-one smoothing over the ``DSIR_BUCKETS``
    bucket space the per-document weight is::

        weight = (t_mass / T) / (r_mass / R)

    where ``t_mass = Σ_occurrences (target_count(f) + 1)``, ``r_mass``
    the raw twin, and ``T = Σ_buckets target_count + B`` / ``R`` the
    corpus normalizers. Documents with no word tokens have no features
    and drop out (both engines identically).

    Plan shape: tokenize scan → ONE groupBy(feat) computing raw and
    target counts together (single shuffle over ≤ B keys, map-side
    combined) → broadcast join back (B-row side) → groupBy(doc_id).
    """
    docs = spread(docs)
    target = target if target is not None else (F.col("lang") == "en")
    tok = docs.select(
        "doc_id",
        target.cast("long").alias("is_t"),
        F.explode(_features_col(words_col(F.col("text")))).alias("feat"),
    )
    # The frequency table is ≤ DSIR_BUCKETS rows but sits downstream of
    # the full tokenize+hash scan; without a pin its three consumers
    # (broadcast join side, both normalizer sums) would each recompute
    # that scan. Lazy localCheckpoint (the dedup.py pin pattern) keeps
    # the whole job at the two-pass minimum: one scan builds freq, one
    # scan streams tokens past it.
    freq = tok.groupBy("feat").agg(
        F.count(F.lit(1)).alias("r_cnt"),
        F.sum("is_t").alias("t_cnt"),
    ).localCheckpoint(False, storageLevel=_SER)
    tot = freq.agg(
        (F.sum("t_cnt") + F.lit(DSIR_BUCKETS)).alias("t_tot"),
        (F.sum("r_cnt") + F.lit(DSIR_BUCKETS)).alias("r_tot"),
    )
    per_doc = (
        tok.join(F.broadcast(freq), "feat")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(F.col("t_cnt") + F.lit(1)).alias("t_mass"),
            F.sum(F.col("r_cnt") + F.lit(1)).alias("r_mass"),
        )
    )
    return per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_feats",
        "t_mass",
        "r_mass",
        (
            F.col("t_mass").cast("double")
            / F.col("r_mass")
            * F.col("r_tot")
            / F.col("t_tot")
        ).alias("weight"),
    )


def _duck_weights_ctes(target_sql: str = "lang = 'en'") -> str:
    f = _duck_features("w")
    return f"""
    wdocs AS (SELECT doc_id, {target_sql} AS is_t, {duck_words()} AS w
              FROM documents),
    tok AS (SELECT doc_id, is_t, unnest({f}) AS feat FROM wdocs),
    freq AS (SELECT feat, count(*) AS r_cnt,
                    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt
             FROM tok GROUP BY 1),
    tot AS (SELECT CAST(sum(t_cnt) AS BIGINT) + {DSIR_BUCKETS} AS t_tot,
                   CAST(sum(r_cnt) AS BIGINT) + {DSIR_BUCKETS} AS r_tot
            FROM freq),
    per_doc AS (SELECT doc_id, count(*) AS n_feats,
                       CAST(sum(t_cnt + 1) AS BIGINT) AS t_mass,
                       CAST(sum(r_cnt + 1) AS BIGINT) AS r_mass
                FROM tok JOIN freq USING (feat) GROUP BY 1),
    weights AS (SELECT doc_id, n_feats, t_mass, r_mass,
                       CAST(t_mass AS DOUBLE) / r_mass * r_tot / t_tot AS weight
                FROM per_doc, tot)
    """


def dsir_weights_oracle_sql() -> str:
    return f"""
    WITH {_duck_weights_ctes()}
    SELECT doc_id, n_feats, t_mass, r_mass, weight FROM weights
    """


def dsir_select(
    docs: DataFrame,
    target: Column | None = None,
    fraction: float = DSIR_SELECT_FRACTION,
) -> DataFrame:
    """(doc_id, lang, weight) — the top ``fraction`` of each language
    by importance weight, doc_id as the total-order tie-break."""
    w = dsir_weights(docs, target).select("doc_id", "weight")
    d = docs.join(w, "doc_id").select("doc_id", "lang", "weight")
    order = Window.partitionBy("lang").orderBy(F.desc("weight"), F.asc("doc_id"))
    part = Window.partitionBy("lang")
    return (
        d.withColumn("rnk", F.row_number().over(order))
        .withColumn("n", F.count(F.lit(1)).over(part))
        .where(F.col("rnk") <= F.ceil(F.col("n") * F.lit(fraction)))
        .select("doc_id", "lang", "weight")
    )


def dsir_select_oracle_sql(fraction: float = DSIR_SELECT_FRACTION) -> str:
    return f"""
    WITH {_duck_weights_ctes()},
    ranked AS (
        SELECT d.doc_id, d.lang, weights.weight,
               row_number() OVER (PARTITION BY d.lang
                                  ORDER BY weights.weight DESC, d.doc_id) AS rnk,
               count(*) OVER (PARTITION BY d.lang) AS n
        FROM documents d JOIN weights ON d.doc_id = weights.doc_id
    )
    SELECT doc_id, lang, weight FROM ranked
    WHERE rnk <= ceil(n * {fraction})
    """


def dsir_select_scalable(
    docs: DataFrame,
    target: Column | None = None,
    fraction: float = DSIR_SELECT_FRACTION,
) -> DataFrame:
    """(doc_id, lang, weight) — the scale-safe twin of
    :func:`dsir_select`: importance selection by a per-language VALUE
    threshold instead of a per-language rank window.

    :func:`dsir_select`'s ``Window.partitionBy("lang")`` makes the
    dominant language ONE task — at 100 TB, English is a single sorted
    partition. Here the per-lang cut point (the ``1-fraction``
    percentile of the weight distribution) is derived by aggregation,
    broadcast back (one row per language), and applied as a filter: the
    per-document side is never sorted and never windowed. The
    percentile is exact (bit-identical to the DuckDB oracle's
    ``quantile_cont``); at 100 TB swap it for ``approx_percentile`` —
    one mergeable-sketch pass, same plan shape — without touching the
    filter join (the ``customer_spend_quartiles_scalable`` precedent,
    queries.py).

    Semantics note (the documented tie/boundary caveat): value
    thresholding keeps EVERY document at the cut value and admits
    ~``fraction`` of each language rather than exactly
    ``ceil(n*fraction)`` — the interpolated percentile can fall between
    attained weights. Both are standard selection definitions; the
    rank-window form remains the exact-count contract.
    """
    w = dsir_weights(docs, target).select("doc_id", "weight")
    d = docs.join(w, "doc_id").select("doc_id", "lang", "weight")
    cuts = d.groupBy("lang").agg(
        F.percentile("weight", F.lit(1.0 - fraction)).alias("w_cut")
    )
    return (
        d.join(F.broadcast(cuts), "lang")
        .where(F.col("weight") >= F.col("w_cut"))
        .select("doc_id", "lang", "weight")
    )


def dsir_select_scalable_oracle_sql(fraction: float = DSIR_SELECT_FRACTION) -> str:
    return f"""
    WITH {_duck_weights_ctes()},
    d AS (
        SELECT docs.doc_id, docs.lang, weights.weight
        FROM documents docs JOIN weights ON docs.doc_id = weights.doc_id
    ),
    cuts AS (
        SELECT lang, quantile_cont(weight, {1.0 - fraction}) AS w_cut
        FROM d GROUP BY lang
    )
    SELECT doc_id, d.lang, weight
    FROM d JOIN cuts ON d.lang = cuts.lang
    WHERE weight >= w_cut
    """


def budget_select(docs: DataFrame, budget: int = TOKEN_BUDGET) -> DataFrame:
    """(doc_id, lang, n_tokens, cum_tokens) — per language, documents
    admitted under a token budget in quality order.

    Quality key = fixed-point distinct-token ratio
    ``floor(n_distinct * RATIO_SCALE / n_tokens)`` (Gopher's repetition
    signal as a selection key — repetitive documents rank last), doc_id
    tie-break; a document is kept while the running token total
    (including itself) fits ``budget``. Zero-token documents have no
    defined ratio and are excluded on both sides.
    """
    docs = spread(docs)
    w = words_col(F.col("text"))
    stats = docs.select(
        "doc_id",
        "lang",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
    ).where(F.col("n_tokens") > 0)
    key = F.floor(
        F.col("n_distinct").cast("double") * F.lit(RATIO_SCALE) / F.col("n_tokens")
    ).alias("qkey")
    order = (
        Window.partitionBy("lang")
        .orderBy(F.desc("qkey"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        stats.withColumn("qkey", key)
        .withColumn("cum_tokens", F.sum("n_tokens").over(order))
        .where(F.col("cum_tokens") <= F.lit(budget))
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


def budget_select_oracle_sql(budget: int = TOKEN_BUDGET) -> str:
    w = duck_words()
    return f"""
    WITH stats AS (
        SELECT doc_id, lang,
               len({w}) AS n_tokens,
               len(list_distinct({w})) AS n_distinct
        FROM documents
        WHERE len({w}) > 0
    ),
    keyed AS (
        SELECT doc_id, lang, n_tokens,
               CAST(floor(CAST(n_distinct AS DOUBLE) * {RATIO_SCALE} / n_tokens)
                    AS BIGINT) AS qkey
        FROM stats
    )
    SELECT doc_id, lang, n_tokens, cum_tokens FROM (
        SELECT doc_id, lang, n_tokens,
               CAST(sum(n_tokens) OVER (PARTITION BY lang
                                        ORDER BY qkey DESC, doc_id
                                        ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_tokens
        FROM keyed
    )
    WHERE cum_tokens <= {budget}
    """


def budget_select_scalable(docs: DataFrame, budget: int = TOKEN_BUDGET) -> DataFrame:
    """(doc_id, lang, n_tokens) — the scale-safe twin of
    :func:`budget_select`, admitting EXACTLY the same documents without
    ever running a window over the per-document table.

    The exact form's ``Window.partitionBy("lang")`` running sum makes
    the dominant language one sorted task. But the quality key is a
    fixed-point ratio with at most ``RATIO_SCALE + 1`` distinct values,
    so the running total can be computed over the (lang, qkey) GROUP
    table — bounded at ≤ 1,000,001 rows per language BY CONSTRUCTION,
    at any corpus size. Admission then decomposes exactly:

    - every group wholly under budget is admitted in full (a doc's
      exact-form running total is ≤ its group's cumulative total);
    - the single boundary group per language (group running total first
      exceeds the budget) is refined doc-by-doc — the per-doc window
      runs over THAT GROUP ONLY (filtered before the window; partition
      = docs sharing one exact ratio value in one language, tiny in
      practice — adversarially large only if a language's corpus
      concentrates on one ratio);
    - groups past the boundary are excluded (their every doc's running
      total already exceeds the budget — n_tokens > 0 guarantees the
      prefix property).

    All-integer, so the row set is identical to :func:`budget_select`
    on both engines (the oracle reuses the exact form's SQL, projected;
    tests assert set equality against the window form). ``cum_tokens``
    is not emitted — a per-document global running total is exactly the
    sequential quantity the scalable form avoids materializing.
    """
    docs = spread(docs)
    w = words_col(F.col("text"))
    stats = docs.select(
        "doc_id",
        "lang",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
    ).where(F.col("n_tokens") > 0)
    key = F.floor(
        F.col("n_distinct").cast("double") * F.lit(RATIO_SCALE) / F.col("n_tokens")
    ).alias("qkey")
    # pin: the tokenize+ratio scan feeds both the group table and the
    # final admission scan — one real pass, not two
    keyed = stats.select("doc_id", "lang", "n_tokens", key).localCheckpoint(False, storageLevel=_SER)
    grp = keyed.groupBy("lang", "qkey").agg(F.sum("n_tokens").alias("g_tokens"))
    wg = (
        Window.partitionBy("lang")
        .orderBy(F.desc("qkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grp.withColumn("cum", F.sum("g_tokens").over(wg))
    # ≤ one boundary row per language: the first group whose cumulative
    # total crosses the budget (missing entirely when everything fits)
    bnd = cum.where(
        (F.col("cum") - F.col("g_tokens") <= F.lit(budget))
        & (F.col("cum") > F.lit(budget))
    ).select(
        "lang",
        F.col("qkey").alias("b_qkey"),
        (F.col("cum") - F.col("g_tokens")).alias("cum_before"),
    )
    joined = keyed.join(F.broadcast(bnd), "lang", "left")
    cols = ["doc_id", "lang", "n_tokens"]
    full = joined.where(
        F.col("b_qkey").isNull() | (F.col("qkey") > F.col("b_qkey"))
    ).select(*cols)
    wb = (
        Window.partitionBy("lang", "qkey")
        .orderBy(F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    part = (
        joined.where(F.col("qkey") == F.col("b_qkey"))  # filter BEFORE the window
        .withColumn("in_grp", F.sum("n_tokens").over(wb))
        .where(F.col("cum_before") + F.col("in_grp") <= F.lit(budget))
        .select(*cols)
    )
    return full.unionByName(part)


def budget_select_scalable_oracle_sql(budget: int = TOKEN_BUDGET) -> str:
    # identical row set to the exact form — the oracle IS the exact
    # form's SQL with the sequential cum_tokens column projected away
    return (
        "SELECT doc_id, lang, n_tokens FROM ("
        + budget_select_oracle_sql(budget)
        + ")"
    )


def cluster_safe_split(docs: DataFrame) -> DataFrame:
    """(doc_id, cluster_id, bucket, split) — train/val/test assignment
    that near-dup clusters cross as a UNIT: the split hash is taken
    over the cluster representative (min doc_id of the MinHash-LSH
    connected component), not the document itself. Per-document
    hashing (:func:`~meilisync_spark.operators.sampling.split_assign`)
    can land two near-duplicates on opposite sides of the train/test
    cut — the classic contamination path a held-out set must not have;
    hashing the component label closes it by construction.

    The hash salt and the 80/90 cut points are shared with
    ``split_assign``, so a singleton document (cluster_id = its own
    doc_id) receives the IDENTICAL assignment — adopting the
    cluster-safe form reshuffles only documents that have near-dups.

    Cost over ``split_assign`` is :func:`dedup_clusters` itself (the
    guarded LSH graph + diameter-bounded label propagation); the split
    derivation adds one hash per row, no extra shuffle.
    """
    clusters = dedup_clusters(docs)
    bucket = portable_hash64(F.concat(F.lit("split:"), F.col("cluster_id"))) % 100
    return clusters.select("doc_id", "cluster_id", bucket.alias("bucket")).select(
        "doc_id",
        "cluster_id",
        "bucket",
        F.when(F.col("bucket") < SPLIT_TRAIN, "train")
        .when(F.col("bucket") < SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )


def cluster_safe_split_oracle_sql() -> str:
    h = duck_hash64("'split:' || cluster_id")
    return f"""
    SELECT doc_id, cluster_id, {h} % 100 AS bucket,
           CASE WHEN {h} % 100 < {SPLIT_TRAIN} THEN 'train'
                WHEN {h} % 100 < {SPLIT_VAL} THEN 'val'
                ELSE 'test' END AS split
    FROM ({dedup_clusters_oracle_sql()}) c
    """
