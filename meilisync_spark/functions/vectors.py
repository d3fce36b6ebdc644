"""Vector math over ``array<float>`` embedding columns — pure Catalyst.

Dot products and norms are expressed with ``zip_with`` + ``aggregate``
(left fold, double accumulator): per-row, JVM-side, no UDF, and —
because the fold order is fixed — bit-identical to the DuckDB oracle's
``list_reduce`` over the same widened doubles. float→double widening is
exact in both engines, so no rounding/tolerance is needed anywhere.

Scale note: these run inside whole-stage codegen over the scan — the
similarity operators' cost is dominated by the join fan-out
(see operators/similarity.py), not this math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


# --- DuckDB mirrors (fragments over DOUBLE[] expressions) -----------------

def duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip(CAST({a} AS DOUBLE[]), "
        f"CAST({b} AS DOUBLE[])), z -> z[1] * z[2]), (acc, x) -> acc + x)"
    )


def duck_norm(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform(CAST({a} AS DOUBLE[]), "
        f"x -> x * x), (acc, x) -> acc + x))"
    )


def duck_cosine(a: str, b: str) -> str:
    return f"({duck_dot(a, b)} / ({duck_norm(a)} * {duck_norm(b)}))"
