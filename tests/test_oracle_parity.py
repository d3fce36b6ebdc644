"""The main correctness gate, run locally: every registry query vs its
DuckDB oracle — the same comparison shape the driver performs
(row count + schema + order-insensitive value equality)."""

from __future__ import annotations

import pytest

from meilisync_spark import queries as Q
from tests.conftest import SF_CORRECT, compare_to_oracle


def _names():
    return sorted(Q.REGISTRY.keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    spec = Q.REGISTRY[name]
    df = spec.fn(spark, SF_CORRECT)
    if spec.sql is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    con = duck(SF_CORRECT)
    compare_to_oracle(df, con, spec.sql, name=name)


def test_driver_window_contract():
    """The driver oracle-checks only the first 50 queries() entries, so
    the ordering IS the contract: exactly 50 explicitly-ordered names,
    every one registered, driver-facing, oracle-backed (no no_oracle
    rows in the window), and scalar-typed (array/map/binary output
    crashes the driver comparator's pandas canonicalization)."""
    assert len(Q.DRIVER_ORDER) == 50
    assert len(set(Q.DRIVER_ORDER)) == 50
    ordered = list(Q.queries())
    assert ordered[:50] == Q.DRIVER_ORDER
    for name in Q.DRIVER_ORDER:
        spec = Q.REGISTRY[name]
        assert spec.driver_facing, name
        assert spec.sql is not None, f"{name}: sql=None inside the driver window"
    # every driver-facing entry has an oracle (the sql=None trio is
    # library-only); oracle_sql() covers exactly the queries() names
    assert set(Q.oracle_sql()) == set(ordered)


def test_driver_window_output_scalar(spark):
    """No array/map/binary columns in the schemas of the first-50
    window entries (the driver comparator sorts values in pandas and
    ndarray cells are unhashable). Schema-only — nothing executes."""
    from pyspark.sql import types as T

    from tests.conftest import SF_SMOKE

    for name in Q.DRIVER_ORDER:
        if name.startswith("streaming_"):
            # these execute the stream eagerly when called; their output
            # schemas are explicit scalar select lists (queries.py
            # _run_streaming_to_table callers) — covered by the parity test
            continue
        df = Q.REGISTRY[name].fn(spark, SF_SMOKE)
        for f in df.schema.fields:
            assert not isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.BinaryType)
            ), f"{name}.{f.name}: {f.dataType}"
            # DECIMAL renders scale-padded in Spark but as float64 in
            # the driver's oracle materialization — final outputs must
            # be cast to DOUBLE (the decimal-sum-then-cast rule)
            assert not isinstance(
                f.dataType, T.DecimalType
            ), f"{name}.{f.name}: {f.dataType} (cast final decimals to double)"
