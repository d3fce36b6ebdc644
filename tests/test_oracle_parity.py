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
