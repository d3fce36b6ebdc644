"""String-render parity: the driver's comparator hashes the *string*
rendering of pandas-materialized cells, which diverges from typed
equality in ways tests/conftest.compare_to_oracle cannot see:

- Spark DECIMAL collects as ``Decimal('136991.00')`` (scale-padded)
  while DuckDB ``.df()`` gives float64 ``136991.0`` — round 1 lost 13
  green rows to this;
- DuckDB ``sum()`` over integers returns HUGEINT, which pandas
  materializes as float64 (``'25.0'``) while Spark's long renders
  ``'25'`` — round 2's driver_sim caught event_sessions and span_dedup.

This test replays the driver's exact shape (``toPandas`` vs ``.df()``,
columns sorted by name, rows sorted by string rendering, cell-by-cell
string equality) for every oracle-backed registry entry, so any new
query with a render-divergent output type fails locally before it
reaches the scoreboard. tools/driver_sim.py is the standalone runner
(use it at sf0.01, the driver's correctness SF).
"""

from __future__ import annotations

import pytest

from meilisync_spark import queries as Q
from tests.conftest import SF_CORRECT


def _canon_rows(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return sorted(map(tuple, pdf.astype(str).values.tolist()))


def _names():
    return sorted(Q.oracle_sql().keys())


@pytest.mark.parametrize("name", _names())
def test_string_render_matches_oracle(spark, duck, name):
    spec = Q.REGISTRY[name]
    s_pdf = spec.fn(spark, SF_CORRECT).toPandas()
    con = duck(SF_CORRECT)  # keep alive: the relation weak-refs it
    d_pdf = con.sql(spec.sql).df()
    assert sorted(s_pdf.columns) == sorted(d_pdf.columns), name
    s_rows, d_rows = _canon_rows(s_pdf), _canon_rows(d_pdf)
    assert len(s_rows) == len(d_rows), name
    diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
    assert not diffs, f"{name}: string-render mismatch, first diffs: {diffs}"
