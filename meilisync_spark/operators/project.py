"""Projection / rename / type normalization (P1, P2, F1, F2).

Reference behavior re-expressed:

- P1 ``fields`` map: ``SELECT f AS alias`` on the snapshot path
  (meilisync/source/mysql.py:37-40) and a dict-remap on the CDC path
  (meilisync/schemas.py:25-30). Here both are one ``df.select``.
  Note: the reference's "fall back to the full row when the projection
  result is empty" quirk (schemas.py:30, SURVEY.md Q5) is replicated
  structurally — an empty/None fields map means identity projection.
- P2 type normalization (meilisync/schemas.py:18-24): datetime →
  epoch *seconds* as int (F1, asserted 223250453 in
  tests/test_mysql.py:30), date → ISO string (F2).

Scale notes: pure narrow ops; the select list reaches the parquet
footer (ReadSchema pruning). Zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def apply_fields(df: DataFrame, fields: dict[str, str | None] | None) -> DataFrame:
    """P1: projection + rename. ``{src: alias_or_None}``; None keeps name.

    An empty/None map keeps the full row (reference quirk Q5,
    meilisync/schemas.py:30: ``return data or self.data``).
    """
    if not fields:
        return df
    return df.select(*[F.col(src).alias(alias or src) for src, alias in fields.items()])


ENVELOPE_COLS = ("seq", "table", "op", "pk")


def apply_envelope_fields(
    ev: DataFrame, fields: dict[str, str | None] | None
) -> DataFrame:
    """P1 on the CDC path: project/rename the *payload* columns of a
    normalized envelope, keeping the envelope columns (seq/table/op/pk)
    intact — the reference remaps each event's data dict through the
    sync rule's fields map before the sink write
    (meilisync/schemas.py:25-30 via main.py:107-109). Empty/None map ⇒
    full payload (quirk Q5)."""
    if not fields:
        return ev
    keep = [c for c in ENVELOPE_COLS if c in ev.columns]
    return ev.select(
        *keep, *[F.col(src).alias(alias or src) for src, alias in fields.items()]
    )


def normalize_types(df: DataFrame) -> DataFrame:
    """P2/F1/F2: timestamps → epoch seconds (long), dates → ISO strings.

    Mirrors meilisync/schemas.py:18-24 over *every* column of the
    schema, which is what the reference does to each event dict.
    """
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.TimestampNTZType):
            # NTZ can't cast to long directly; go via session-tz (UTC)
            cols.append(c.cast("timestamp").cast("long").alias(f.name))
        elif isinstance(f.dataType, T.TimestampType):
            cols.append(c.cast("long").alias(f.name))  # epoch seconds
        elif isinstance(f.dataType, T.DateType):
            cols.append(F.date_format(c, "yyyy-MM-dd").alias(f.name))
        else:
            cols.append(c)
    return df.select(*cols)


def snapshot_sync(df: DataFrame, fields: dict[str, str | None] | None = None) -> DataFrame:
    """The reference's full-sync unit: projection then normalization.

    ≡ source.get_full_data → mapping_data per chunk
    (meilisync/main.py:86-99), minus pagination (a partitioned scan).
    """
    return normalize_types(apply_fields(df, fields))
