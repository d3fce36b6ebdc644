#!/usr/bin/env python
"""Literal simulation of the round driver's correctness comparator.

The local parity suite (tests/conftest.compare_to_oracle) compares
typed values, which is stricter in some ways but MISSES render-level
divergence: the driver materializes both sides to pandas, sorts, and
hashes the *string* rendering of every cell. Round 1 proved the gap —
13 value-correct queries went red because Spark's collected
``Decimal('136991.00')`` strs differently than DuckDB fetchdf's
``float64 136991.0``.

This tool replays that exact comparison shape for every driver-window
query at the driver's correctness SF (sf0.01):

- Spark side: ``df.toPandas()`` (same as a driver collecting via Arrow)
- oracle side: ``con.sql(sql).df()`` (DECIMAL -> float64, the observed
  driver behavior)
- canon: columns sorted by name, rows sorted by every column's string
  rendering, then a sha256 over the full string matrix.

Usage: ``python tools/driver_sim.py [sf_dir] [--all] [--only a,b,c]``
— prints one line per query, exits non-zero if any hash mismatches.
``--all`` checks every oracle-backed registry entry, not just the
50-entry driver window; ``--only`` restricts to named queries.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from meilisync_spark import queries as Q
from meilisync_spark.session import get_spark
from meilisync_spark.sources.parquet import TABLES, table_path


def canon_hash(pdf) -> tuple[str, int]:
    pdf = pdf[sorted(pdf.columns)]
    cells = pdf.astype(str)
    rows = sorted(map(tuple, cells.values.tolist()))
    h = hashlib.sha256()
    for r in rows:
        for c in r:
            h.update(c.encode())
            h.update(b"\x00")
        h.update(b"\x01")
    return h.hexdigest(), len(rows)


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--all"]
    check_all = "--all" in sys.argv
    only: list[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1].split(",")
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    spark = get_spark(app_name="driver-sim")
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    sqls = Q.oracle_sql()
    names = list(sqls) if check_all else Q.DRIVER_ORDER
    if only:
        names = [n for n in names if n in only] or only
    bad = []
    for name in names:
        fn = Q.REGISTRY[name].fn
        try:
            if name not in sqls:
                # rows-only entries (no oracle_sql) get the driver's
                # weaker check: the query runs and returns rows
                n = fn(spark, sf_dir).count()
                print(f"OK  {name}: rows-only {n}")
                continue
            s_pdf = fn(spark, sf_dir).toPandas()
            d_pdf = con.sql(sqls[name]).df()
            sh, sn = canon_hash(s_pdf)
            dh, dn = canon_hash(d_pdf)
            ok = sh == dh and sn == dn
            cols_ok = sorted(s_pdf.columns) == sorted(d_pdf.columns)
            status = "OK " if ok and cols_ok else "FAIL"
            if not (ok and cols_ok):
                bad.append(name)
            print(f"{status} {name}: rows {sn}/{dn} cols_ok={cols_ok} hash_ok={sh == dh}")
            if not ok and sn == dn and cols_ok:
                # first differing row rendering, for diagnosis
                s_rows = sorted(map(tuple, s_pdf[sorted(s_pdf.columns)].astype(str).values.tolist()))
                d_rows = sorted(map(tuple, d_pdf[sorted(d_pdf.columns)].astype(str).values.tolist()))
                for a, b in zip(s_rows, d_rows):
                    if a != b:
                        print(f"     spark  {a}\n     oracle {b}")
                        break
        except Exception as e:  # noqa: BLE001 — report like the driver's err column
            bad.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {e}")
    print(f"\n{len(names) - len(bad)}/{len(names)} green; failing: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
