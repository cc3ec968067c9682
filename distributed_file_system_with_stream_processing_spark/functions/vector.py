"""Vector Column builders for embedding similarity — JVM-side only.

Cosine similarity is expressed with zip_with + aggregate (sequential
left-to-right double accumulation), which matches DuckDB's
``list_sum(list_transform(...))`` bit-for-bit, so oracle value hashes
line up without tolerance hacks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    """float[] → double[] (exact widening, portable)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """dot/(sqrt(|a|²)·sqrt(|b|²)) — same association as the oracle SQL."""
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))
