"""Skew mitigation for shuffle joins: deterministic key salting.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
on in session.tune) is the first line of defense — it splits oversized
*shuffle blocks* at runtime with no code change. Salting is the
explicit fallback for the cases AQE can't fix: a dimension too big to
broadcast joined on a key where a handful of values dominate (the
classic "null key / mega-customer" hot partition). The fan-out join
replicates the small side ``n_salts`` times so each hot key's rows
spread over ``n_salts`` shuffle partitions instead of one straggler
task.

Semantics are exactly inner-equi-join (property-tested against the
plain join in tests/test_skew.py); the salt is derived from a
per-row distinct column with the portable hash, so results are
deterministic across runs and partitionings.

The reference has no joins at all (SURVEY §2.3); this is engine
infrastructure for the 100-TB target.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meilisync_spark.functions.hashing import portable_hash64

DEFAULT_SALTS = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    row_col: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Inner/left equi-join of ``big`` and ``small`` on ``key`` with the
    big side salted into ``n_salts`` sub-keys.

    ``row_col``: a column of ``big`` whose (key, row_col) pairs spread
    rows of a hot key roughly uniformly (any high-cardinality column —
    a pk, an event id). The salt is ``hash(row_col) % n_salts``:
    deterministic, partition-independent.

    The small side is replicated ``n_salts``× via ``explode`` — keep
    ``n_salts × |small|`` well under shuffle-partition capacity. Output
    columns = big's columns then small's non-key columns, like a plain
    ``big.join(small, key)``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    # NULL row_col would make the salt NULL and the equi-join would
    # silently drop the row — park NULLs deterministically in salt 0
    salt = F.coalesce(
        portable_hash64(F.concat(F.lit("salt:"), F.col(row_col).cast("string")))
        % n_salts,
        F.lit(0),
    )
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [key, "__salt"], how).drop("__salt")
    # restore plain-join column order: key, big cols, small cols
    cols = [key] + [c for c in big.columns if c != key] + [
        c for c in small.columns if c != key
    ]
    return out.select(*cols)
