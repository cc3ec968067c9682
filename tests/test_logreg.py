"""Distributed logistic regression: the Spark trainer must equal an
independent pure-Python reference implementing the same quantized
arithmetic, and training must actually move the model (loss down,
accuracy above chance)."""

from __future__ import annotations

import math

from distributed_file_system_with_stream_processing_spark.operators import logreg as L
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

_MICRO = 1_000_000


def _collect_xy(spark, positive_below=5):
    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    return [
        (list(map(float, r["embedding"])), 1.0 if r["label"] < positive_below else 0.0)
        for r in rows
    ]


def _py_fit(xy, iters=2, lr=0.5, dim=64):
    """Reference trainer: sequential left-to-right dots, per-row
    contributions rounded once to integer micro-units, exact integer
    sums, the identical update sequence."""
    w, b = [0.0] * dim, 0.0
    n = len(xy)
    for _ in range(iters):
        g = [0] * dim
        gb = 0
        for v, y in xy:
            z = b
            acc = 0.0
            for a, wi in zip(v, w):
                acc += a * wi
            z = acc + b
            p = 1.0 / (1.0 + math.exp(-z))
            d = p - y
            for i in range(dim):
                # Python round() is banker's; Spark/DuckDB round() is
                # half-away-from-zero — use floor(x+0.5) sign-split
                c = d * v[i] * _MICRO
                g[i] += int(math.floor(c + 0.5)) if c >= 0 else -int(math.floor(-c + 0.5))
            cb = d * _MICRO
            gb += int(math.floor(cb + 0.5)) if cb >= 0 else -int(math.floor(-cb + 0.5))
        w = [w[i] - lr * ((g[i] / float(_MICRO)) / n) for i in range(dim)]
        b = b - lr * ((gb / float(_MICRO)) / n)
    return w, b


def test_logreg_fit_matches_python_reference(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    w_s, b_s = L.logreg_fit(emb, iters=2, lr=0.5, dim=64)
    w_p, b_p = _py_fit(_collect_xy(spark), iters=2, lr=0.5, dim=64)
    assert b_s == b_p
    assert w_s == w_p


def test_logreg_training_improves_fit(spark):
    """Each GD step must reduce the full-batch log loss, and the
    2-step model must beat chance accuracy on its training set (the
    label signal in the synthetic embeddings is learnable)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    xy = _collect_xy(spark)

    def loss(w, b):
        tot = 0.0
        for v, y in xy:
            z = sum(a * wi for a, wi in zip(v, w)) + b
            p = 1.0 / (1.0 + math.exp(-z))
            p = min(max(p, 1e-12), 1 - 1e-12)
            tot += -(y * math.log(p) + (1 - y) * math.log(1 - p))
        return tot / len(xy)

    l0 = loss([0.0] * 64, 0.0)
    w1, b1 = L.logreg_fit(emb, iters=1)
    w2, b2 = L.logreg_fit(emb, iters=2)
    l1, l2 = loss(w1, b1), loss(w2, b2)
    assert l1 < l0 and l2 < l1, (l0, l1, l2)

    scored = L.logreg_score(emb, w2, b2).collect()
    acc = sum(1 for r in scored if r["pred"] == r["y"]) / len(scored)
    assert acc > 0.55, acc


def test_logreg_score_is_pure_map(spark):
    """Scoring with trained literals must plan with no joins and no
    shuffles — weights are metadata, like centroids."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    df = L.logreg_score(emb, [0.01] * 64, 0.1)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_logreg_score_stream_matches_batch(spark, tmp_path):
    """Streaming scorer (weights as literals, append mode, no state):
    all micro-batches together must equal the batch scorer row-for-row
    on the same data."""
    import os

    from distributed_file_system_with_stream_processing_spark.streaming.rainstorm import (
        logreg_score_stream,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    w, b = L.logreg_fit(emb, iters=2)

    src = str(tmp_path / "emb")
    os.makedirs(src)
    half1 = emb.filter("vec_id % 2 = 0")
    half2 = emb.filter("vec_id % 2 = 1")
    half1.coalesce(1).write.mode("append").parquet(src)
    half2.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    batch = {
        r["vec_id"]: (r["y"], r["p"], r["pred"])
        for r in L.logreg_score(spark.read.schema(schema).parquet(src), w, b).collect()
    }
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        logreg_score_stream(stream, w, b)
        .writeStream.format("memory")
        .queryName("logreg_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["vec_id"]: (r["y"], r["p"], r["pred"])
        for r in spark.sql("SELECT * FROM logreg_stream").collect()
    }
    assert streamed == batch and len(batch) == emb.count()
