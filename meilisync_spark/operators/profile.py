"""Corpus profiling — the ANALYZE-style pre-flight of a data pipeline.

One full-scan aggregate computes every column's stats (null counts,
exact distincts, numeric ranges, string length moments) in a single
pass, then the one-row result is melted to long form
``(col_name, metric, value)`` — scalar doubles only, so the profile
is sink/driver-friendly at any width.

Scale shape: ONE scan + one aggregate; the multi-distinct expands to
Spark's Expand-based plan (each distinct a separate group-set, still
map-side partial). At 100 TB swap exact distincts for
``approx_count_distinct`` (HLL++, mergeable sketches) — same output
schema, documented here rather than switched silently, because the
oracle checks the exact form.

The reference has no profiling surface; its closest call is the count
consistency check (meilisync/main.py check — see operators/check.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, numeric_cols: list[str], string_cols: list[str]
) -> DataFrame:
    """(col_name, metric, value) — per-column profile in one pass.

    Metrics: every column gets ``n_nulls`` and ``n_distinct``; numeric
    columns add ``min``/``max``/``sum``; string columns add
    ``min_len``/``max_len``/``avg_len``. Values are DOUBLE.
    """
    aggs = []
    metrics: list[tuple[str, str]] = []

    def add(col: str, metric: str, expr) -> None:
        aggs.append(expr.cast("double").alias(f"{col}__{metric}"))
        metrics.append((col, metric))

    for c in numeric_cols + string_cols:
        add(c, "n_nulls", F.sum(F.col(c).isNull().cast("long")))
        add(c, "n_distinct", F.count_distinct(F.col(c)))
    for c in numeric_cols:
        add(c, "min", F.min(c))
        add(c, "max", F.max(c))
        # exact cross-partition sum: integral inputs stay exact in
        # decimal, then widen (doubles would be partial-agg-order
        # dependent for fractional inputs — numeric_cols here are
        # integral; document before adding raw-double columns)
        add(c, "sum", F.sum(F.col(c).cast("decimal(28,2)")))
    for c in string_cols:
        add(c, "min_len", F.min(F.length(c)))
        add(c, "max_len", F.max(F.length(c)))
        add(
            c,
            "avg_len",
            F.sum(F.length(c).cast("decimal(28,0)")).cast("double")
            / F.count(F.col(c)),
        )

    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', '{m}', `{c}__{m}`" for c, m in metrics
    )
    n = len(metrics)
    return one.selectExpr(
        f"stack({n}, {stack_args}) AS (col_name, metric, value)"
    )


def profile_documents_oracle_sql() -> str:
    """DuckDB twin for the documents-table profile registration."""
    rows = []
    for c in ["doc_id", "n_chars"]:
        rows += [
            f"SELECT '{c}' AS col_name, 'n_nulls' AS metric, CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS value FROM documents",
            f"SELECT '{c}', 'n_distinct', CAST(count(DISTINCT {c}) AS DOUBLE) FROM documents",
            f"SELECT '{c}', 'min', CAST(min({c}) AS DOUBLE) FROM documents",
            f"SELECT '{c}', 'max', CAST(max({c}) AS DOUBLE) FROM documents",
            f"SELECT '{c}', 'sum', CAST(sum({c}) AS DOUBLE) FROM documents",
        ]
    for c in ["text", "lang", "source"]:
        rows += [
            f"SELECT '{c}', 'n_nulls', CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS DOUBLE) FROM documents",
            f"SELECT '{c}', 'n_distinct', CAST(count(DISTINCT {c}) AS DOUBLE) FROM documents",
            f"SELECT '{c}', 'min_len', CAST(min(length({c})) AS DOUBLE) FROM documents",
            f"SELECT '{c}', 'max_len', CAST(max(length({c})) AS DOUBLE) FROM documents",
            f"SELECT '{c}', 'avg_len', CAST(sum(length({c})) AS DOUBLE) / count({c}) FROM documents",
        ]
    return " UNION ALL ".join(rows)
