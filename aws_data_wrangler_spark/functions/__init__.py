"""Shared column-expression helpers (JVM-side, codegen-friendly).

The numeric-stability conventions live here: cross-engine-stable
truncation and the vector primitives used by similarity/dedup
operators — all built from ``pyspark.sql.functions`` so they stay
inside whole-stage codegen.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Union[Column, str]


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def trunc_digits(col: ColumnOrName, digits: int = 6) -> Column:
    """Truncate toward -inf at ``digits`` decimals.

    Used instead of ``round`` for per-row float outputs that must match
    a second engine bit-for-bit: IEEE ``floor`` on an identical double
    is identical everywhere, while round-half behavior differs between
    engines (Spark HALF_UP vs DuckDB's sprintf-style rounding).
    """
    scale = float(10**digits)
    return F.floor(_col(col) * scale) / scale


def vec_dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Sequential (left-to-right) dot product of two array columns —
    same summation order as DuckDB's list_dot_product, so results are
    bit-identical across engines."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm(a: ColumnOrName) -> Column:
    """L2 norm with sequential summation."""
    col = _col(a)
    return F.sqrt(F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def vec_cosine(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity (assumes nonzero vectors)."""
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
