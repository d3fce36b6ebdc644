"""As-of (temporal) join — an operator Spark lacks natively.

For each left row, find the single most recent right row for the same
key with ``right_ts <= left_ts`` (backward, inclusive — the semantics
of DuckDB's ``ASOF JOIN`` and pandas ``merge_asof``). The reference has
no joins at all (SURVEY.md §2.3); this is engine surface a CDC/training
pipeline needs constantly (latest dimension version at event time,
latest quote at trade time).

Implementation is the scalable union formulation, not a range join:

1. union left and right rows into one stream, tagged by side;
2. one shuffle: ``Window.partitionBy(key).orderBy(ts, side, seq)`` —
   right rows sort *before* left rows at equal ts (inclusive match) and
   ties among right rows resolve by ``seq`` (last wins);
3. ``last(payload_struct, ignorenulls=True)`` over rows-unbounded-
   preceding carries the latest right payload forward;
4. keep only left rows.

Why this shape at 100 TB: a naive ``left.join(right, key) .where(rts <=
lts)`` + max_by explodes to |left|×|right| per key before filtering;
the union form shuffles each input exactly once, sorts within
partitions (spillable), and never materializes cross products. Skewed
keys: a hot key's rows land in one partition — pre-split with AQE skew
handling does not apply to windows, so extremely hot keys should be
range-bucketed by time first (same trick as sessionization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_TS = "_asof_ts"
_SEQ = "_asof_seq"
_PAYLOAD = "_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_seq: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns every ``left`` row plus ``right_cols`` from the most recent
    ``right`` row of the same ``by`` key with ``right[right_ts] <=
    left[left_ts]`` (NULLs when no such row). Ties among right rows at
    the same timestamp resolve to the highest ``right_seq`` (arrival
    order — the engine's last-wins rule, SURVEY.md T9).
    """
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    payload = F.struct(*[F.col(c) for c in right_cols]).alias(_PAYLOAD)
    r = right.select(
        F.col(by),
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        (F.col(right_seq) if right_seq else F.lit(0)).cast("long").alias(_SEQ),
        payload,
    )
    l = left.select(
        "*",
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(0).cast("long").alias(_SEQ),
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_SEQ).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: Column = F.last(_PAYLOAD, ignorenulls=True).over(w)
    out = (
        merged.withColumn(_PAYLOAD, carried)
        .where(F.col(_SIDE) == 1)
        .drop(_TS, _SIDE, _SEQ)
    )
    for c in right_cols:
        out = out.withColumn(c, F.col(f"{_PAYLOAD}.{c}"))
    return out.drop(_PAYLOAD)
