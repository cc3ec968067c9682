"""Round-7 batch IV: embedding-space structure audits (label cohesion
via the sum-vector identity, dimension correlation via an Arrow
partial-Gram, norm ANOVA, per-dimension sparsity).

Same contract as the other ``llm_ops*`` modules. The float→integer
discipline here: embedding components (or derived unit components /
norms) quantize ONCE through the same ``round(x·10⁶)`` expression in
both engines, and every reduction after that is an exact integer sum
(DECIMAL/HUGEINT where squares exceed BIGINT) — which is what lets a
pandas-UDF partial Gram and a DuckDB explode-join produce the same
bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.functions import vector as V
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

_MICRO = 1_000_000
_DIM = 64

# ---------------------------------------------------------------------------
# embedding_label_cohesion


def embedding_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra- vs inter-label mean cosine per label WITHOUT any pair
    join: on unit vectors, Σ_{i≠j∈L} cos(i,j) = ‖Σ_L u‖² − Σ_L‖u‖²
    and the label-vs-rest mean is (S_L · S_rest)/(n_L·n_rest) — the
    separability audit (cohesion gap ≈ how linearly clusterable the
    labels are) at O(n·d) + a (label, dim) rollup, where the naive
    definition is O(n²·d).

    Exactness: unit components quantize once (round(u·10⁶), BIGINT);
    per-(label, dim) sums are exact integers; squares/cross-products
    fold in DECIMAL(38,0)↔HUGEINT; two double divisions at the end.
    The ‖u‖²≈1 terms use the SAME quantized components (Σq², exact),
    so both engines agree bit-for-bit.

    100 TB shape: one scan → explode to (label, dim, q) → 64·|labels|
    partial-agg rows; everything downstream is label-scale.
    Quantization happens AFTER the explode as a plain scalar
    expression (codegen'd): a transform() lambda referencing the
    materialized norm column runs interpreted per element (~5 µs/elem
    measured — 6.4 s at sf1 for this projection alone); the exploded
    scalar form is the same arithmetic in whole-stage codegen."""
    e = load_table(spark, sf_dir, "embeddings")
    v = V.as_double(F.col("embedding"))
    staged = e.select(
        "vec_id", "label", v.alias("v")
    ).withColumn("nrm", F.sqrt(V.sq_norm(F.col("v"))))
    base = staged.filter(F.col("nrm") > 0)
    ex = (
        base.select(
            "label", "nrm", F.posexplode_outer("v").alias("d", "x")
        )
        .filter(F.col("x").isNotNull())
        .select(
            "label",
            "d",
            # ok-round: irrational (x/sqrt-norm) quantization
            F.round(F.col("x") / F.col("nrm") * _MICRO).cast("long").alias("qv"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    # ONE corpus-scale aggregation carries everything downstream:
    # per (label, dim) the component sum, the component-square sum and
    # the member count (constant across dims within a label). Five
    # separate aggregates over `ex` re-ran the scan+explode per
    # consumer before this (measured ~9 s at sf1; label-scale after
    # this single pass).
    per_ld = ex.groupBy("label", "d").agg(
        F.sum("qv").alias("sd"),
        F.sum(dec("qv") * dec("qv")).alias("sq"),
        F.count(F.lit(1)).alias("cnt"),
    )
    stats = per_ld.groupBy("label").agg(
        F.max("cnt").alias("n"),
        F.sum("sq").alias("ssq"),
        F.sum(dec("sd") * dec("sd")).alias("s2"),
    )
    all_d = per_ld.groupBy("d").agg(F.sum("sd").alias("ad"))
    cross = (
        per_ld.join(broadcast(all_d), "d")
        .groupBy("label")
        .agg(F.sum(dec("sd") * (dec("ad") - dec("sd"))).alias("xp"))
    )
    tot = stats.agg(F.sum("n").alias("nn"))
    j = stats.join(cross, "label").crossJoin(broadcast(tot))
    # r8 conversion: intra/inter are exact rationals of the integer
    # sums (qv is already micro-quantized) — truncating integer
    # division at 6 dp in DECIMAL(38,0) headroom ((s2−ssq) ≤ n²·10¹²·d,
    # divisor ≤ n²·10⁶; both well inside 38 digits at any SF), and the
    # gap is the exact integer difference of the two micro values
    intra_mu = F.when(
        F.col("n") >= 2,
        F.expr(
            f"(s2 - ssq) div (cast(n as decimal(38,0)) * (n - 1) * {_MICRO})"
        ),
    ).otherwise(F.lit(0).cast("long"))
    inter_mu = F.when(
        (F.col("nn") - F.col("n")) > 0,
        F.expr(
            f"xp div (cast(n as decimal(38,0)) * (nn - n) * {_MICRO})"
        ),
    ).otherwise(F.lit(0).cast("long"))
    return j.select(
        F.col("label").cast("long").alias("label"),
        F.col("n").cast("long").alias("n_vectors"),
        (intra_mu.cast("double") / 1e6).alias("intra_cosine"),
        (inter_mu.cast("double") / 1e6).alias("inter_cosine"),
        ((intra_mu - inter_mu).cast("double") / 1e6).alias("cohesion_gap"),
    )


EMBEDDING_LABEL_COHESION_SQL = f"""
WITH e AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS v,
           sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
    FROM embeddings
),
base AS (
    SELECT vec_id, label,
           -- ok-round: irrational (x/sqrt-norm) quantization
           list_transform(v, x -> CAST(round(x / nrm * {_MICRO}) AS BIGINT)) AS q
    FROM e WHERE nrm > 0
),
ex AS (
    SELECT label, d, q[d] AS qv
    FROM base CROSS JOIN (SELECT unnest(range(1, {_DIM} + 1)) AS d)
),
per_ld AS (SELECT label, d, sum(qv) AS sd FROM ex GROUP BY label, d),
ssq AS (
    SELECT label, sum(CAST(qv AS HUGEINT) * qv) AS ssq FROM ex GROUP BY label
),
n_l AS (SELECT label, count(*) AS n FROM base GROUP BY label),
s2 AS (
    SELECT label, sum(CAST(sd AS HUGEINT) * sd) AS s2 FROM per_ld GROUP BY label
),
all_d AS (SELECT d, sum(sd) AS ad FROM per_ld GROUP BY d),
cross_ AS (
    SELECT p.label, sum(CAST(p.sd AS HUGEINT) * (a.ad - p.sd)) AS xp
    FROM per_ld p JOIN all_d a USING (d) GROUP BY p.label
),
tot AS (SELECT sum(n) AS nn FROM n_l),
mu AS (
    SELECT n_l.label, n_l.n,
           CASE WHEN n_l.n >= 2
                THEN (s2.s2 - ssq.ssq)
                     // (CAST(n_l.n AS HUGEINT) * (n_l.n - 1) * {_MICRO})
                ELSE 0 END AS intra_mu,
           CASE WHEN tot.nn - n_l.n > 0
                THEN cross_.xp
                     // (CAST(n_l.n AS HUGEINT) * (tot.nn - n_l.n) * {_MICRO})
                ELSE 0 END AS inter_mu
    FROM n_l JOIN s2 USING (label) JOIN ssq USING (label)
             JOIN cross_ USING (label) CROSS JOIN tot
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(n AS BIGINT) AS n_vectors,
       CAST(intra_mu AS DOUBLE) / {_MICRO}.0 AS intra_cosine,
       CAST(inter_mu AS DOUBLE) / {_MICRO}.0 AS inter_cosine,
       CAST(intra_mu - inter_mu AS DOUBLE) / {_MICRO}.0 AS cohesion_gap
FROM mu
"""


# ---------------------------------------------------------------------------
# embedding_dim_corr_topk

_DCT_TOPK = 20


def embedding_dim_corr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most correlated embedding-dimension PAIRS — redundancy
    in the representation (highly correlated dims waste capacity and
    mislead product quantizers that assume independent subspaces).

    Plan: components quantize once through the JVM expression
    round(x·10⁶) (the same expression the oracle uses), then an
    Arrow ``mapInPandas`` computes each batch's PARTIAL Gram matrix
    Qᵀ·Q with int64 matmul — 64×64·batches rows out, O(n·d²) work
    with NO shuffle of the raw vectors — and a (d1, d2) rollup folds
    partials in DECIMAL(38,0). Integer addition is order-free, so
    this equals DuckDB's explode-self-join bit-for-bit; corr derives
    from the moment sums in double. The oracle's O(n·d²) join is the
    naive twin the Gram replaces at scale.
    """
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings")
    v = V.as_double(F.col("embedding"))
    q = F.transform(v, lambda x: F.round(x * _MICRO).cast("long"))
    base = e.select(q.alias("q"))

    def gram(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack(pdf["q"].to_numpy()).astype(np.int64)  # b×64
            g = Q.T @ Q  # 64×64 int64 partial Gram
            s = Q.sum(axis=0)  # per-dim sums
            iu = np.triu_indices(Q.shape[1])
            out = pd.DataFrame(
                {
                    "d1": iu[0].astype("int64"),
                    "d2": iu[1].astype("int64"),
                    "s": g[iu],
                }
            )
            sums = pd.DataFrame(
                {
                    "d1": np.arange(Q.shape[1], dtype="int64"),
                    "d2": np.full(Q.shape[1], -1, dtype="int64"),
                    "s": s,
                }
            )
            cnt = pd.DataFrame({"d1": [-1], "d2": [-1], "s": [len(pdf)]})
            yield pd.concat([out, sums, cnt], ignore_index=True)

    parts = base.mapInPandas(gram, "d1 long, d2 long, s long")
    agg = parts.groupBy("d1", "d2").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s")
    )
    n = agg.filter((F.col("d1") == -1) & (F.col("d2") == -1)).select(
        F.col("s").cast("double").alias("n")
    )
    sums = agg.filter((F.col("d1") >= 0) & (F.col("d2") == -1)).select(
        F.col("d1").alias("d"), F.col("s").alias("sd")
    )
    gram_t = agg.filter(F.col("d2") >= 0)
    diag = gram_t.filter(F.col("d1") == F.col("d2")).select(
        F.col("d1").alias("d"), F.col("s").alias("sdd")
    )
    pairs = (
        gram_t.filter(F.col("d1") < F.col("d2"))
        .join(broadcast(sums.withColumnRenamed("d", "d1").withColumnRenamed("sd", "s1")), "d1")
        .join(broadcast(sums.withColumnRenamed("d", "d2").withColumnRenamed("sd", "s2")), "d2")
        .join(broadcast(diag.withColumnRenamed("d", "d1").withColumnRenamed("sdd", "s11")), "d1")
        .join(broadcast(diag.withColumnRenamed("d", "d2").withColumnRenamed("sdd", "s22")), "d2")
        .crossJoin(broadcast(n))
    )
    num = F.col("n") * F.col("s").cast("double") - F.col("s1").cast(
        "double"
    ) * F.col("s2").cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("s11").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double"))
        * (F.col("n") * F.col("s22").cast("double") - F.col("s2").cast("double") * F.col("s2").cast("double"))
    )
    out = pairs.filter(den > 0).select(
        F.col("d1").cast("long").alias("d1"),
        F.col("d2").cast("long").alias("d2"),
        # ok-round: irrational (sqrt in the denominator)
        F.round(num / den, 6).alias("corr"),
        # ok-round: irrational (sqrt in the denominator)
        F.round(F.abs(num / den), 6).alias("abs_corr"),
    )
    return out.orderBy(
        F.col("abs_corr").desc(), F.col("d1").asc(), F.col("d2").asc()
    ).limit(_DCT_TOPK)


EMBEDDING_DIM_CORR_SQL = f"""
WITH base AS (
    SELECT vec_id,
           list_transform(embedding::DOUBLE[],
                          x -> CAST(round(x * {_MICRO}) AS BIGINT)) AS q
    FROM embeddings
),
ex AS (
    SELECT vec_id, d - 1 AS d, q[d] AS qv
    FROM base CROSS JOIN (SELECT unnest(range(1, {_DIM} + 1)) AS d)
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM base),
sums AS (SELECT d, sum(qv) AS sd, sum(CAST(qv AS HUGEINT) * qv) AS sdd
         FROM ex GROUP BY d),
gram AS (
    SELECT a.d AS d1, b.d AS d2, sum(CAST(a.qv AS HUGEINT) * b.qv) AS s
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.d < b.d
    GROUP BY a.d, b.d
),
corr AS (
    SELECT g.d1, g.d2,
           (n.n * CAST(g.s AS DOUBLE) - CAST(s1.sd AS DOUBLE) * s2.sd)
           / sqrt((n.n * CAST(s1.sdd AS DOUBLE) - CAST(s1.sd AS DOUBLE) * s1.sd)
                  * (n.n * CAST(s2.sdd AS DOUBLE) - CAST(s2.sd AS DOUBLE) * s2.sd))
               AS c
    FROM gram g
    JOIN sums s1 ON s1.d = g.d1
    JOIN sums s2 ON s2.d = g.d2
    CROSS JOIN n
    WHERE (n.n * CAST(s1.sdd AS DOUBLE) - CAST(s1.sd AS DOUBLE) * s1.sd)
          * (n.n * CAST(s2.sdd AS DOUBLE) - CAST(s2.sd AS DOUBLE) * s2.sd) > 0
)
SELECT CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
       round(c, 6) AS corr, round(abs(c), 6) AS abs_corr
FROM corr
ORDER BY abs_corr DESC, d1 ASC, d2 ASC LIMIT {_DCT_TOPK}
"""


# ---------------------------------------------------------------------------
# embedding_norm_anova


def embedding_norm_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of vector NORMS across labels: F-statistic and
    η² — does the embedding encode label identity in plain magnitude
    (a normalization bug signature: cosine retrieval would be blind
    to it, dot-product retrieval dominated by it)? Norms quantize
    once (round(‖x‖·10⁶)); SSB/SSW come from per-label integer sums
    via the standard moment identities; HUGEINT/DECIMAL squares."""
    e = load_table(spark, sf_dir, "embeddings")
    v = V.as_double(F.col("embedding"))
    nq = F.round(F.sqrt(V.sq_norm(v)) * _MICRO).cast("long")
    base = e.select("label", nq.alias("nq"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per = base.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("nq").alias("s"),
        F.sum(dec("nq") * dec("nq")).alias("ss"),
    )
    # s²/n per label: one double round-trip, rounded to BIGINT so the
    # across-label fold is order-free (decimal DIVISION scales differ
    # between engines; a rounded double does not)
    # s²/n exceeds 2^53 at any realistic corpus (round() on an
    # already-integral double is identity in both engines) and the
    # exact div would overflow the BIGINT result Spark's div returns —
    # ok-round: documented triage KEEP
    sb_term = F.round(
        F.col("s").cast("double") * F.col("s").cast("double") / F.col("n")
    ).cast("long")
    tot = per.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ts"),
        F.sum("ss").alias("tss"),
        F.sum(sb_term).alias("sb_part"),
    )
    nn = F.col("nn").cast("double")
    grand_sq = F.col("ts").cast("double") * F.col("ts").cast("double") / nn
    ssb = F.col("sb_part").cast("double") - grand_sq
    ssw = F.col("tss").cast("double") - F.col("sb_part").cast("double")
    kd = F.col("k").cast("double")
    f_stat = F.when(
        (F.col("k") >= 2) & (ssw > 0),
        (ssb / (kd - 1)) / (ssw / (nn - kd)),
    ).otherwise(F.lit(-1.0))
    eta = F.when(
        (ssb + ssw) > 0, ssb / (ssb + ssw)
    ).otherwise(F.lit(0.0))
    return tot.select(
        F.col("k").cast("long").alias("n_labels"),
        F.col("nn").cast("long").alias("n_vectors"),
        F.round(f_stat, 4).alias("f_stat"),
        F.round(eta, 6).alias("eta_sq"),
    )


EMBEDDING_NORM_ANOVA_SQL = f"""
WITH base AS (
    SELECT label,
           CAST(round(sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                   x -> x * x))) * {_MICRO})
                AS BIGINT) AS nq
    FROM embeddings
),
per AS (
    SELECT label, count(*) AS n, sum(nq) AS s,
           sum(CAST(nq AS HUGEINT) * nq) AS ss
    FROM base GROUP BY label
),
tot AS (
    SELECT count(*) AS k, sum(n) AS nn, sum(s) AS ts, sum(ss) AS tss,
           -- ok-round: documented triage KEEP (see the Spark twin)
           sum(CAST(round(CAST(s AS DOUBLE) * s / n) AS BIGINT)) AS sb_part
    FROM per
)
SELECT CAST(k AS BIGINT) AS n_labels,
       CAST(nn AS BIGINT) AS n_vectors,
       -- ok-round: rational of >2^53 integers (exact form overflows)
       round(CASE WHEN k >= 2 AND CAST(tss AS DOUBLE) - CAST(sb_part AS DOUBLE) > 0
                  THEN ((CAST(sb_part AS DOUBLE)
                         - CAST(ts AS DOUBLE) * ts / nn) / (k - 1))
                       / ((CAST(tss AS DOUBLE) - CAST(sb_part AS DOUBLE))
                          / (nn - k))
                  ELSE CAST(-1.0 AS DOUBLE) END, 4) AS f_stat,
       -- ok-round: rational of >2^53 integers (exact form overflows)
       round(CASE WHEN CAST(tss AS DOUBLE) - CAST(ts AS DOUBLE) * ts / nn > 0
                  THEN (CAST(sb_part AS DOUBLE) - CAST(ts AS DOUBLE) * ts / nn)
                       / (CAST(tss AS DOUBLE) - CAST(ts AS DOUBLE) * ts / nn)
                  ELSE CAST(0.0 AS DOUBLE) END, 6) AS eta_sq
FROM tot
"""


# ---------------------------------------------------------------------------
# embedding_sparsity_profile

_SPARSE_EPS_MICRO = 50_000  # |x| < 0.05


def embedding_sparsity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per dimension: how often the component is (near-)zero
    (|x| < 0.05) and its mean |x| — dead/weak channel detection for
    pruning and PQ subspace design. Comparison happens on the
    quantized integers (|round(x·10⁶)| < 50000) so the threshold is
    bit-stable; mean |x| divides an exact integer sum. One explode →
    64-row rollup."""
    e = load_table(spark, sf_dir, "embeddings")
    v = V.as_double(F.col("embedding"))
    q = F.transform(v, lambda x: F.round(x * _MICRO).cast("long"))
    ex = e.select(F.posexplode_outer(q).alias("d", "qv")).filter(
        F.col("qv").isNotNull()
    )
    agg = ex.groupBy("d").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.abs(F.col("qv")) < _SPARSE_EPS_MICRO).cast("long")).alias(
            "n_small"
        ),
        F.sum(F.abs(F.col("qv"))).alias("sa"),
    )
    return agg.select(
        F.col("d").cast("long").alias("dim"),
        F.col("n").cast("long").alias("n_vectors"),
        F.col("n_small").cast("long").alias("n_near_zero"),
        # exact truncating integer-division share/mean (r7 conversion; see
        # llm_ops21.orders_basket_size_profile)
        (F.expr("(n_small * 1000000) div n").cast("double") / 1e6).alias(
            "near_zero_share"
        ),
        (F.expr("sa div n").cast("double") / _MICRO).alias(
            "mean_abs"
        ),
    )


EMBEDDING_SPARSITY_SQL = f"""
WITH ex AS (
    SELECT d - 1 AS d,
           CAST(round(v[d] * {_MICRO}) AS BIGINT) AS qv
    FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings)
    CROSS JOIN (SELECT unnest(range(1, {_DIM} + 1)) AS d)
)
SELECT CAST(d AS BIGINT) AS dim,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(sum(CASE WHEN abs(qv) < {_SPARSE_EPS_MICRO} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_near_zero,
       CAST((sum(CASE WHEN abs(qv) < {_SPARSE_EPS_MICRO} THEN 1 ELSE 0 END)
             * 1000000) // count(*) AS DOUBLE) / 1000000.0 AS near_zero_share,
       CAST(sum(abs(qv)) // count(*) AS DOUBLE) / {_MICRO}.0 AS mean_abs
FROM ex GROUP BY d
"""


QUERIES = {
    "embedding_label_cohesion": embedding_label_cohesion,
    "embedding_dim_corr_topk": embedding_dim_corr_topk,
    "embedding_norm_anova": embedding_norm_anova,
    "embedding_sparsity_profile": embedding_sparsity_profile,
}

ORACLES = {
    "embedding_label_cohesion": EMBEDDING_LABEL_COHESION_SQL,
    "embedding_dim_corr_topk": EMBEDDING_DIM_CORR_SQL,
    "embedding_norm_anova": EMBEDDING_NORM_ANOVA_SQL,
    "embedding_sparsity_profile": EMBEDDING_SPARSITY_SQL,
}
