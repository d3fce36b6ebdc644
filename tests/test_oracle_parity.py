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
    # The driver records a WEAKER rows-only check for entries without
    # an oracle_sql() string. The window deliberately carries exactly
    # four such rows: the production BPE OOV encode (iterative training
    # upstream — not SQL-expressible; fast==fold equality is the
    # suite's gate), the layout doctor audit (path-bound footer
    # metadata — the DuckDB parquet_metadata() cross-check lives in
    # tests/test_layout.py, because the oracle strings only see the
    # pre-registered sf views), and — rotated in round 12 per VERDICT
    # r11 #7 — the exact fixed-point Lloyd trainer (iterative;
    # numpy-replicated exactly in tests/test_kmeans.py) and the zlib
    # compression-ratio signal (no zlib in DuckDB; pinned against
    # direct zlib in tests). Everything else in the window must stay
    # hash-checked.
    ROWS_ONLY_IN_WINDOW = {"bpe_encode_oov_fast", "layout_report",
                           "kmeans_labels", "compression_ratio"}
    for name in Q.DRIVER_ORDER:
        spec = Q.REGISTRY[name]
        assert spec.driver_facing, name
        if name in ROWS_ONLY_IN_WINDOW:
            assert spec.sql is None, f"{name}: gained an oracle — update the set"
        else:
            assert spec.sql is not None, f"{name}: sql=None inside the driver window"
    # every other driver-facing entry has an oracle; oracle_sql()
    # covers exactly the queries() names minus the rows-only pair
    assert set(Q.oracle_sql()) == set(ordered) - ROWS_ONLY_IN_WINDOW


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
