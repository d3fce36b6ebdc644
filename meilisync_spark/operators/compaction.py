"""Pk compaction — last-wins dedup within a batch (A5, T9).

The reference buffers events in ``EventCollection`` keyed by
``(sync, pk)`` where a later event simply overwrites the dict slot
(meilisync/event.py:10-13): a create followed by an update collapses to
the update; anything followed by a delete collapses to the delete.

Spark realization: ``max_by(struct(payload), seq)`` per key.

Why ``max_by`` and not a window or ``dropDuplicates``:

- ``dropDuplicates`` keeps an *arbitrary first* row — wrong semantics
  (SURVEY.md T9).
- ``row_number() over (partition by pk order by seq desc)`` needs a
  full sort of every group; ``max_by`` is a hash aggregate with a
  map-side partial (each input partition pre-reduces to ≤1 row per key
  before the shuffle), so at 100 TB the shuffle carries at most
  |distinct keys| × |partitions| rows instead of every event. One
  shuffle, no sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compact_last_wins(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_col: str = "seq",
) -> DataFrame:
    """Keep only the latest row per key, ordered by ``seq_col``.

    ``seq_col`` must be a total order within each key (the reference
    relies on arrival order; we use the event id / binlog position,
    FIXTURES.md §2). Output columns == input columns.
    """
    key_cols = list(key_cols)
    payload = [c for c in df.columns if c not in key_cols]
    packed = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in payload]), F.col(seq_col)).alias("_last")
    )
    return packed.select(*key_cols, *[F.col(f"_last.{c}").alias(c) for c in payload])


def compaction_oracle_sql(inner: str, key_cols: Sequence[str], payload_cols: Sequence[str],
                          seq_col: str = "seq") -> str:
    """DuckDB mirror of :func:`compact_last_wins`, kept adjacent to the
    Spark code to prevent drift.

    Uses ``arg_max(struct_pack(...))`` rather than per-column
    ``arg_max`` because DuckDB's ``arg_max`` *skips NULL args* — a NULL
    payload value in the winning row would silently fall back to an
    older non-null one, which is not last-wins. A struct is never NULL,
    so packing sidesteps that (and matches Spark's
    ``max_by(struct(...), seq)`` exactly).
    """
    keys = ", ".join(f'"{c}"' for c in key_cols)
    packed = ", ".join(f'"{c}" := "{c}"' for c in payload_cols)
    unpacked = ", ".join(f'_last."{c}" AS "{c}"' for c in payload_cols)
    return (
        f'SELECT {keys}, {unpacked} FROM ('
        f'SELECT {keys}, arg_max(struct_pack({packed}), "{seq_col}") AS _last '
        f'FROM ({inner}) GROUP BY {keys})'
    )
