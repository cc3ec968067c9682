"""Distributed logistic regression over an embedding column —
full-batch gradient descent run as one Spark job per iteration, the
quality-classifier training step of an LLM data pipeline (the
fasttext-style "good vs bad document" scorer, here over dense
embeddings with an integer label → binary target).

Execution model (the kmeans/BPE centroids-are-metadata stance,
clustering.py:1-27): the weight vector (dim+1 doubles) lives on the
driver between iterations; the corpus never reshuffles. Each
iteration is ONE job:

    scan → z = w·x + b (pure column fold, weights as parsed literals)
    → p = sigmoid(z) → per-component gradient contributions
    round((p − y)·x_i · 1e6) as BIGINT → one global aggregate of
    dim+1 exact-integer sums + count (map-side partials) → 1 row to
    the driver → w ← w − lr·(g/1e6)/n.

Bit-stability contract (what makes the DuckDB oracle hash-match, the
same ledger as kmeans_fit):
- every per-row contribution is quantized ONCE to integer micro-units,
  so the cross-row reduction is an order-free integer sum;
- the dot product is a sequential left-to-right double accumulation
  (zip_with + aggregate ↔ DuckDB list_sum(list_transform), the
  established lockstep association);
- the driver's update arithmetic ``w - lr*((g/1e6)/n)`` is the
  oracle's ``w - lr*((CAST(g AS DOUBLE)/1000000.0)/n)`` — the
  identical op sequence, and doubles round-trip through repr exactly;
- sigmoid's exp() is the one transcendental: both engines' libm may
  differ in the last ulp, absorbed by the micro-quantization of each
  contribution (the perplexity-family precedent).

100 TB: the aggregate is dim+1 longs per partition (map-side
combine); iterations are metadata-synchronized like Lloyd passes;
persist the prepared (v, y) projection across iterations exactly as
kmeans_fit persists its vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.functions import vector as V
from distributed_file_system_with_stream_processing_spark.operators._util import spread as _spread
from distributed_file_system_with_stream_processing_spark.operators.clustering import _lit_arr

_MICRO = 1_000_000


def _dot_w(vec_col: str, w: list[float]) -> str:
    """Sequential left-to-right w·x fold (expr string)."""
    return (
        f"aggregate(zip_with({vec_col}, {_lit_arr(w)}, (a, b) -> a * b), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_fit(
    emb: DataFrame,
    label_col: str = "label",
    positive_below: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    lr: float = 0.5,
    dim: int = 64,
) -> tuple[list[float], float]:
    """Train (w, b) with ``iters`` full-batch GD steps from w = 0
    (so iteration 1's p is exactly 0.5 in every engine — exp(0) is
    exact). Binary target y = 1 if label < ``positive_below``.
    Returns plain Python floats (engine-portable literals)."""
    e = _spread(
        emb.select(
            V.as_double(F.col(vec_col)).alias("v"),
            F.when(F.col(label_col) < positive_below, 1.0).otherwise(0.0).alias("y"),
        )
    ).persist()
    w = [0.0] * dim
    b = 0.0
    try:
        for _ in range(iters):
            p = sigmoid(F.expr(_dot_w("v", w)) + F.lit(b))
            diff = (p - F.col("y")).alias("d")
            agg = e.select(F.col("v"), diff).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("d") * _MICRO).cast("long")).alias("gb"),
                *[
                    F.sum(
                        F.round(F.col("d") * F.element_at("v", i + 1) * _MICRO).cast(
                            "long"
                        )
                    ).alias(f"g{i}")
                    for i in range(dim)
                ],
            )
            r = agg.collect()[0]
            n = r["n"]
            w = [w[i] - lr * ((r[f"g{i}"] / float(_MICRO)) / n) for i in range(dim)]
            b = b - lr * ((r["gb"] / float(_MICRO)) / n)
    finally:
        e.unpersist()
    return w, b


def logreg_score(
    emb: DataFrame,
    w: list[float],
    b: float,
    label_col: str = "label",
    positive_below: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, y, p, pred): score every vector with trained weights —
    a pure map (weights are literals; zero joins, zero shuffles)."""
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        V.as_double(F.col(vec_col)).alias("v"),
        F.when(F.col(label_col) < positive_below, 1).otherwise(0).alias("y"),
    )
    p = sigmoid(F.expr(_dot_w("v", w)) + F.lit(b))
    return e.select(
        "vec_id",
        F.col("y").cast("long").alias("y"),
        F.round(p, 6).alias("p"),
        (p >= 0.5).cast("long").alias("pred"),
    )
