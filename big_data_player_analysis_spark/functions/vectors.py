"""Vector math over ``array<float>`` embedding columns — pure built-in
higher-order functions (zip_with / aggregate), evaluated JVM-side. The
pandas-UDF path is deliberately NOT used here: for 64-dim vectors the
codegen'd expression beats the Arrow round-trip, and it keeps the whole
similarity-search plan inside Catalyst.

Floats are upcast to double before any arithmetic so Spark and an ANSI-SQL
oracle accumulate identically (left-to-right over the same doubles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """sum_i a_i * b_i via zip_with + aggregate (left-to-right fold)."""
    prods = F.zip_with(to_double_array(a), to_double_array(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
