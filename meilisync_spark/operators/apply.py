"""MERGE-style apply of compacted changes into a keyed index table.

This is the engine's realization of the reference's sink writes
(S9/S10/S11, meilisync/meili.py:121-151):

- ``create``  → ``add_documents``: full-document replace/insert.
- ``update``  → ``update_documents``: **partial** upsert — only the
  provided (non-NULL) fields overwrite; missing fields keep the sink's
  current value (Mongo updates carry only ``updatedFields``,
  meilisync/source/mongo.py:62-64 → SURVEY.md Q4).
- ``delete``  → ``delete_documents``: drop the pk.

The reference applies events one dict at a time; here the whole batch
is one relational MERGE: compact last-wins per pk (A5), then a single
full-outer equi-join against the current index state with per-column
``CASE``/``coalesce``.

Scale notes:

- One shuffle (the pk join); AQE picks SMJ vs shuffled-hash and splits
  skewed keys. With a table format (Delta/Iceberg) this operator maps
  1:1 onto ``MERGE INTO`` with file-level pruning so the full index is
  *not* rewritten — the plain-parquet fallback here rewrites, which is
  correct but O(index) per batch; ``foreachBatch`` callers should
  partition the index table by pk-bucket so only touched buckets
  rewrite.
- The changes side of a CDC micro-batch is normally tiny relative to
  the index: Catalyst broadcast-joins it where the join type allows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meilisync_spark.operators.compaction import compact_last_wins, compaction_oracle_sql

# value-preserving widening chains (ALTER TABLE ... TYPE safe set): a
# column may drift ALONG a chain in either direction between base and
# changes — the merge output takes the wider end. Cross-family drift
# (string→int, double→decimal, …) is a narrowing/reinterpretation and
# fails loudly instead of silently casting.
_INT_CHAIN = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_CHAIN = (T.FloatType, T.DoubleType)


def _chain_rank(dt: T.DataType, chain) -> int | None:
    for i, t in enumerate(chain):
        if isinstance(dt, t):
            return i
    return None


def _widen(a: T.DataType, b: T.DataType, col: str) -> T.DataType:
    """The common type both sides widen to losslessly, or ValueError."""
    if a == b:
        return a
    for chain in (_INT_CHAIN, _FLOAT_CHAIN):
        ra, rb = _chain_rank(a, chain), _chain_rank(b, chain)
        if ra is not None and rb is not None:
            return chain[max(ra, rb)]()
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        # grow integer digits and scale independently (never truncates)
        scale = max(a.scale, b.scale)
        ints = max(a.precision - a.scale, b.precision - b.scale)
        if ints + scale > 38:
            raise ValueError(
                f"column {col!r}: decimal widening of {a.simpleString()} vs "
                f"{b.simpleString()} exceeds precision 38"
            )
        return T.DecimalType(ints + scale, scale)
    raise ValueError(
        f"column {col!r}: incompatible type drift between index "
        f"({a.simpleString()}) and changes ({b.simpleString()}) — only "
        "integral widening, float→double, and decimal growth are safe; "
        "migrate the index explicitly for anything else"
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    pk: str = "pk",
    seq_col: str = "seq",
    op_col: str = "op",
    payload_cols: Sequence[str] | None = None,
) -> DataFrame:
    """New index state = ``base`` ⊕ ``changes``.

    ``base``: current index (``pk`` + payload columns).
    ``changes``: normalized CDC events (``pk``, ``seq``, ``op`` ∈
    {create,update,delete} + the same payload columns).

    Schema drift is tolerated in both directions (the reference sink is
    schemaless — an ALTER TABLE upstream just starts emitting the new
    field, meilisync/schemas.py:16 carries an untyped dict):

    - a column only in ``changes`` (new upstream field): existing rows
      get NULL, creates/updates carry the value;
    - a column only in ``base`` (narrowed projection): updates keep the
      sink's current value, creates null it (full-document replace).
    - a column on BOTH sides with drifted types: value-preserving
      widenings (byte→short→int→long, float→double, decimal
      precision/scale growth — the safe ALTER TABLE set) resolve to the
      wider type on both sides of the merge; anything lossy (string vs
      int, double vs decimal, long→int that would truncate) raises
      instead of silently corrupting the index.
    """
    base_payload = [c for c in base.columns if c != pk]
    if payload_cols is None:
        change_payload = [c for c in changes.columns if c not in (pk, seq_col, op_col)]
        payload_cols = base_payload + [c for c in change_payload if c not in base_payload]
    last = compact_last_wins(changes, [pk], seq_col)

    # type of each column, taken from whichever side actually has it —
    # the absent side contributes a typed NULL so the union schema is
    # stable regardless of which batch introduced the column; a column
    # both sides carry resolves to the widened common type
    types = {f.name: f.dataType for f in base.schema.fields}
    for f in last.schema.fields:
        if f.name in types:
            types[f.name] = _widen(types[f.name], f.dataType, f.name)
        else:
            types[f.name] = f.dataType

    b, d = base.alias("b"), last.alias("d")
    joined = b.join(d, F.col(f"b.{pk}") == F.col(f"d.{pk}"), "full_outer")
    op = F.col(f"d.{op_col}")
    side_types = {
        "b": {f.name: f.dataType for f in base.schema.fields},
        "d": {f.name: f.dataType for f in last.schema.fields},
    }

    def side(prefix: str, cols: Sequence[str], c: str):
        if c in cols:
            col = F.col(f"{prefix}.{c}")
            if side_types[prefix][c] != types[c]:  # widen drifted side
                col = col.cast(types[c])
            return col
        return F.lit(None).cast(types[c])

    out_cols = [F.coalesce(F.col(f"d.{pk}"), F.col(f"b.{pk}")).alias(pk)]
    for c in payload_cols:
        bcol, dcol = side("b", base.columns, c), side("d", last.columns, c)
        out_cols.append(
            F.when(op == "create", dcol)                      # full replace
            .when(op == "update", F.coalesce(dcol, bcol))     # partial
            .otherwise(bcol)                                  # untouched row
            .alias(c)
        )
    return joined.where(op.isNull() | (op != "delete")).select(*out_cols)


def apply_changes_oracle_sql(
    base_inner: str,
    changes_inner: str,
    pk: str = "pk",
    seq_col: str = "seq",
    op_col: str = "op",
    payload_cols: Sequence[str] = (),
) -> str:
    """DuckDB mirror of :func:`apply_changes` (adjacent to prevent drift)."""
    compact = compaction_oracle_sql(
        changes_inner, [pk], [op_col, *payload_cols], seq_col=seq_col
    )
    cases = ", ".join(
        f'CASE WHEN d."{op_col}" = \'create\' THEN d."{c}" '
        f'WHEN d."{op_col}" = \'update\' THEN COALESCE(d."{c}", b."{c}") '
        f'ELSE b."{c}" END AS "{c}"'
        for c in payload_cols
    )
    return f"""
    SELECT COALESCE(d."{pk}", b."{pk}") AS "{pk}", {cases}
    FROM ({base_inner}) b
    FULL OUTER JOIN ({compact}) d ON b."{pk}" = d."{pk}"
    WHERE d."{op_col}" IS NULL OR d."{op_col}" <> 'delete'
    """
