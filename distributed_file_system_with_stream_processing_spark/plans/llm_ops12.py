"""Round-6 batch III: embedding-space audits (dim kurtosis, split
drift, intrinsic dimension) and corpus-order/density screens.

Same contract as the other ``llm_ops*`` modules: declarative
DataFrame plans (JVM expressions only) with DuckDB oracles mirroring
the exact arithmetic, so value hashes match without tolerances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.functions import text as T
from distributed_file_system_with_stream_processing_spark.operators._util import (
    plan_ckpt as _plan_ckpt,
)
from distributed_file_system_with_stream_processing_spark.operators._util import spread
from distributed_file_system_with_stream_processing_spark.plans.llm_ops import _WS
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

_MICRO = 1_000_000

# ---------------------------------------------------------------------------
# embedding_dim_kurtosis


def embedding_dim_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess kurtosis per embedding dimension (histogrammed into
    heavy/normal/light tails) — the component-health screen next to
    ``embedding_dim_variance``: a dimension with huge kurtosis is a
    spike/outlier channel (hurts quantization), one near −1.2 is
    bimodal. Output: per tail-class counts plus the extreme dims.

    Exactness: components micro-quantize once (round(x·1e6) as
    BIGINT); the four moment sums (Σq, Σq², Σq³, Σq⁴) fold exactly in
    DECIMAL(38,0) ↔ HUGEINT; kurtosis = n·M4/M2² − 3 with
    M4 = Σ(q−q̄)⁴ expanded in exact integer arithmetic SCALED by n
    (M4·n³ and M2·n are integers: n³·M4 = n³Σq⁴ − 4n²Σq³Σq +
    6nΣq²(Σq)² − 3(Σq)⁴), so the double division happens once;
    zero-variance dims pin to 0.0.

    100 TB shape: one posexplode + a 64-group partial agg — the dim
    key count is the vector width, metadata scale.
    """
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = F.round(F.col("x") * _MICRO).cast("long")
    ex = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    ).select("dim", q.alias("q"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per = ex.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s1"),
        F.sum(dec("q") * dec("q")).alias("s2"),
        F.sum(dec("q") * dec("q") * dec("q")).alias("s3"),
        F.sum(dec("q") * dec("q") * dec("q") * dec("q")).alias("s4"),
    )
    n = dec("n")
    # n³·M4 and n·M2 are exact integers; kurt = n·M4/M2² − 3
    #   = n·(n³M4) / (nM2)² − 3
    m4n3 = (
        n * n * n * F.col("s4")
        - F.lit(4) * n * n * dec("s1") * F.col("s3")
        + F.lit(6) * n * dec("s1") * dec("s1") * F.col("s2")
        - F.lit(3) * dec("s1") * dec("s1") * dec("s1") * dec("s1")
    )
    m2n = n * F.col("s2") - dec("s1") * dec("s1")
    kurt = F.when(
        m2n > 0,
        # n·m4/(m2)² is rational, but the exact cross-multiplied form
        # needs ~2× DECIMAL(38) headroom (4th-moment products) —
        # ok-round: documented triage KEEP (identical double fold)
        F.round(
            (n * m4n3).cast("double") / (m2n * m2n).cast("double") - 3.0, 6
        ),
    ).otherwise(F.lit(0.0))
    return per.select(F.col("dim").cast("long").alias("dim"), kurt.alias("excess_kurtosis"))


EMBEDDING_DIM_KURTOSIS_SQL = f"""
WITH ex AS (
    SELECT u.dim - 1 AS dim,
           CAST(round(u.x * {_MICRO}) AS BIGINT) AS q
    FROM (
        SELECT unnest(embedding::DOUBLE[]) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings
    ) u
),
per AS (
    SELECT dim, count(*) AS n, sum(q) AS s1,
           sum(CAST(q AS HUGEINT) * q) AS s2,
           sum(CAST(q AS HUGEINT) * q * q) AS s3,
           sum(CAST(q AS HUGEINT) * q * q * q) AS s4
    FROM ex GROUP BY dim
)
SELECT CAST(dim AS BIGINT) AS dim,
       CASE WHEN CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 > 0
            -- ok-round: documented triage KEEP (see the Spark twin)
            THEN round(CAST(CAST(n AS HUGEINT) * (
                         CAST(n AS HUGEINT) * n * n * s4
                         - 4 * CAST(n AS HUGEINT) * n * s1 * s3
                         + 6 * CAST(n AS HUGEINT) * s1 * s1 * s2
                         - 3 * CAST(s1 AS HUGEINT) * s1 * s1 * s1
                       ) AS DOUBLE)
                       / CAST((CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
                              * (CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
                              AS DOUBLE) - 3.0, 6)
            ELSE CAST(0.0 AS DOUBLE) END AS excess_kurtosis
FROM per
"""


# ---------------------------------------------------------------------------
# embedding_centroid_shift


def embedding_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid displacement between the two vec_id-parity
    halves of the corpus — the embedding-drift canary: if a label's
    even-half and odd-half centroids disagree, that class is
    heterogeneous or the upstream encoder shifted mid-ingest
    (complements ``embedding_label_drift``'s collapse screen).

    Exactness: per-half per-dim component sums are exact micro
    integers; each dim's mean difference evaluates in one fixed
    double sequence (s_even/1e6/n_even − s_odd/1e6/n_odd), squares
    accumulate left-to-right over dims (the lockstep sequential
    pattern), and the final √ rounds at 6 dp. Labels missing a half
    are excluded in both engines (inner join of halves).

    100 TB shape: one (label, parity, dim) partial agg over the
    posexplode (metadata-scale groups: labels × 2 × 64), then a
    labels-sized join + fold.
    """
    e = spread(load_table(spark, sf_dir, "embeddings"))
    ex = e.select(
        "label",
        (F.col("vec_id") % 2).alias("par"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    ).select(
        "label", "par", "dim", F.round(F.col("x") * _MICRO).cast("long").alias("q")
    )
    # r10 optimization: the old (label, par, dim) agg + parity
    # self-join referenced the aggregate twice (per-branch pruning ⇒
    # the corpus posexplode ran twice, 17 stages / 5 Exchanges
    # measured). Conditional sums fold both halves in ONE (label, dim)
    # aggregation — no join, no duplicated subtree, one corpus-scale
    # shuffle fewer at any scale. Identical integers: se/so/ne/no are
    # the same exact sums the joined branches produced, and the inner
    # join's "both halves present" semantics is the ne>0 AND no>0
    # filter.
    per = ex.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("par") == 0, F.col("q")).otherwise(F.lit(0))).alias("se"),
        F.sum(F.when(F.col("par") == 1, F.col("q")).otherwise(F.lit(0))).alias("so"),
        F.sum(F.when(F.col("par") == 0, 1).otherwise(0)).alias("ne"),
        F.sum(F.when(F.col("par") == 1, 1).otherwise(0)).alias("no"),
    )
    j = per.filter((F.col("ne") > 0) & (F.col("no") > 0))
    diff = (
        F.col("se").cast("double") / _MICRO / F.col("ne")
        - F.col("so").cast("double") / _MICRO / F.col("no")
    )
    agg = j.groupBy("label").agg(
        F.sum(diff * diff).alias("ss"),
        F.max("ne").alias("n_even"),
        F.max("no").alias("n_odd"),
    )
    return agg.select(
        F.col("label").cast("long").alias("label"),
        F.col("n_even").cast("long").alias("n_even"),
        F.col("n_odd").cast("long").alias("n_odd"),
        F.round(F.sqrt(F.col("ss")), 6).alias("centroid_shift"),
    )


EMBEDDING_CENTROID_SHIFT_SQL = f"""
WITH ex AS (
    SELECT label, vec_id % 2 AS par, u.dim AS dim,
           CAST(round(u.x * {_MICRO}) AS BIGINT) AS q
    FROM (
        SELECT label, vec_id,
               unnest(embedding::DOUBLE[]) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings
    ) u
),
per AS (
    SELECT label, par, dim, sum(q) AS s, count(*) AS n
    FROM ex GROUP BY label, par, dim
),
j AS (
    SELECT e.label, e.dim,
           CAST(e.s AS DOUBLE) / {_MICRO} / e.n
           - CAST(o.s AS DOUBLE) / {_MICRO} / o.n AS diff,
           e.n AS ne, o.n AS no
    FROM (SELECT * FROM per WHERE par = 0) e
    JOIN (SELECT * FROM per WHERE par = 1) o USING (label, dim)
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(max(ne) AS BIGINT) AS n_even,
       CAST(max(no) AS BIGINT) AS n_odd,
       round(sqrt(sum(diff * diff)), 6) AS centroid_shift
FROM j GROUP BY label
"""


# ---------------------------------------------------------------------------
# embedding_intrinsic_dim


def embedding_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-NN intrinsic-dimension estimate (Facco et al. 2017,
    "Estimating the intrinsic dimension of datasets by a minimal
    neighborhood information"): d̂ = n / Σ ln(r₂/r₁) over each
    point's two nearest neighbors — the is-my-64-dim-space-really-
    64-dim audit that prices how hard ANN/quantization will be.
    Neighbors come from the √n-cell trained partition (the kNN-graph
    economics — at true corpus scale the cells keep the candidate
    set bounded); points whose r₁ = 0 (exact duplicates) carry no
    information and are excluded, the estimator's standard practice.

    Exactness: squared distances accumulate left-to-right (lockstep
    doubles in both engines); ln(r₂/r₁) = 0.5·(ln d₂² − ln d₁²)
    micro-quantizes PER POINT from those lockstep doubles, so the
    reduction is an exact integer sum; d̂ divides once, 6 dp.

    100 TB shape: the kNN-graph plan (Lloyd metadata + ONE corpus
    shuffle on cell + per-query top-2 window) ending in a 1-row fold.
    """
    import math as _math

    from distributed_file_system_with_stream_processing_spark.operators import (
        clustering as C,
    )
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops2 import (
        _KM_ITERS,
    )
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops7 import (
        _knn_cells,
    )

    from distributed_file_system_with_stream_processing_spark.plans import _backbones as B

    emb = load_table(spark, sf_dir, "embeddings")
    # r9 optimization: the ⌈√n⌉-cell Lloyd training here is the SAME
    # call _knn_graph_plan makes (full table, default cols, same k and
    # iters), so read the session-persisted centroid backbone instead
    # of retraining inline — the r8 kmeans_centroids stance
    # (plans/_backbones.py); trained literals are bit-identical.
    cells = _knn_cells(B.embeddings_n(spark, sf_dir))
    cents = B.kmeans_centroids(spark, sf_dir, k=cells, iters=_KM_ITERS)
    assigned = C.ivf_index_prepare(emb, cents)
    a = assigned.select(F.col("id").alias("qid"), F.col("v").alias("qv"), "cell")
    b = assigned.select(F.col("id").alias("nid"), F.col("v").alias("bv"), "cell")
    dsq = F.aggregate(
        F.zip_with(F.col("qv"), F.col("bv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    w = Window.partitionBy("qid").orderBy(F.asc("_d"), F.asc("nid"))
    two = (
        a.join(b, "cell")
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "nid", dsq.alias("_d"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .groupBy("qid")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("_d"))).alias("d1"),
            F.max(F.when(F.col("rk") == 2, F.col("_d"))).alias("d2"),
        )
        .filter((F.col("d1") > 0) & F.col("d2").isNotNull())
    )
    contrib = F.round(
        (F.log(F.col("d2")) - F.log(F.col("d1"))) * 0.5 * _MICRO
    ).cast("long")
    agg = two.agg(
        F.count(F.lit(1)).alias("n_points"), F.sum(contrib).alias("s")
    )
    return agg.select(
        F.col("n_points").cast("long").alias("n_points"),
        # r8 conversion: n/(s/10⁶) = n·10⁶/s exactly — truncating
        # integer division at 6 dp. decimal(38,0) promotion (r9, r8
        # advice): n·10¹² wraps BIGINT past n≈9.2e6 points where the
        # oracle promotes to HUGEINT — the same headroom idiom as the
        # other conversions.
        F.when(
            F.col("s") > 0,
            F.expr(
                "(cast(n_points as decimal(38,0)) * 1000000 * 1000000)"
                " div s"
            ).cast("double")
            / 1e6,
        )
        .otherwise(F.lit(0.0))
        .alias("intrinsic_dim"),
    )


def _intrinsic_dim_sql() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import _DOT  # noqa: F401
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops2 import (
        _KM_ITERS,
        _kmeans_oracle_parts,
    )
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops7 import (
        _KNN_CELLS_SQL,
    )

    dsq = (
        "list_sum(list_transform(range(1, 65), "
        "i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])))"
    )
    return (
        ",\n".join(_kmeans_oracle_parts(_KNN_CELLS_SQL, _KM_ITERS))
        + f""",
dd AS (
    SELECT a.vec_id AS qid, b.vec_id AS nid, {dsq} AS d
    FROM fin a JOIN fin b ON a.c = b.c AND a.vec_id <> b.vec_id),
rk AS (
    SELECT qid, d,
           row_number() OVER (PARTITION BY qid ORDER BY d ASC, nid ASC) AS rk
    FROM dd),
two AS (
    SELECT qid,
           max(CASE WHEN rk = 1 THEN d END) AS d1,
           max(CASE WHEN rk = 2 THEN d END) AS d2
    FROM rk WHERE rk <= 2 GROUP BY qid
),
f AS (SELECT * FROM two WHERE d1 > 0 AND d2 IS NOT NULL),
s AS (
    SELECT count(*) AS n_points,
           sum(CAST(round((ln(d2) - ln(d1)) * 0.5 * {_MICRO}) AS BIGINT)) AS s
    FROM f
)
SELECT CAST(n_points AS BIGINT) AS n_points,
       CASE WHEN s > 0
            THEN CAST((CAST(n_points AS HUGEINT) * 1000000 * 1000000) // s
                      AS DOUBLE) / 1000000.0
            ELSE CAST(0.0 AS DOUBLE) END AS intrinsic_dim
FROM s
"""
    )


# ---------------------------------------------------------------------------
# docs_ngram_novelty_curve

_NOV_BUCKETS = 10
_NOV_N = 3


def docs_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty curve over ingest order: docs bucket into doc_id
    deciles, and each decile reports what share of its trigram
    OCCURRENCES are grams never seen in an EARLIER decile — the
    diminishing-returns read for data collection (a curve collapsing
    to ~0 means later crawl batches add volume, not content; the
    bucketed twin of ``corpus_vocab_growth``'s Heaps curve, for
    n-grams instead of vocabulary).

    Exactness: a gram's first decile is an exact min over integer
    bucket ids (doc_id·10 ÷ (max_id+1), integer floor); counts are
    exact integers; the share divides once at 6 dp.

    100 TB shape: one (gram) partial-agg shuffle carrying
    (first-decile min, per-decile counts via a second rollup) — two
    gram-keyed aggs and a 10-row output; no window over data.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    mx = d.agg(F.max("doc_id").alias("mx"))
    grams = d.select(
        "doc_id",
        F.explode_outer(T.word_ngrams(T.words(F.col("text")), _NOV_N)).alias("g"),
    ).filter(F.col("g").isNotNull())
    bucketed = grams.crossJoin(broadcast(mx)).select(
        (F.col("doc_id") * _NOV_BUCKETS / (F.col("mx") + 1))
        .cast("long")
        .alias("bucket"),
        "g",
    )
    # r10 optimization: `per` feeds the first-decile fold AND the join
    # back — per-branch pruning re-ran the corpus trigram explode for
    # each. Checkpoint the gram-count-table-scale (NOT corpus-scale)
    # aggregate once per invocation (the r9 kn-model stance).
    per = (
        bucketed.groupBy("bucket", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(_plan_ckpt)
    )
    first = per.groupBy("g").agg(F.min("bucket").alias("fb"))
    j = per.join(first, "g")
    out = j.groupBy("bucket").agg(
        F.sum("c").alias("total_grams"),
        F.sum(F.when(F.col("fb") == F.col("bucket"), F.col("c")).otherwise(0)).alias(
            "novel_grams"
        ),
    )
    return out.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("total_grams").cast("long").alias("total_grams"),
        F.col("novel_grams").cast("long").alias("novel_grams"),
        # r8 conversion: exact truncating integer-division rate
        (
            F.expr("(novel_grams * 1000000) div total_grams").cast("double")
            / 1e6
        ).alias("novel_share"),
    )


def _novelty_sql() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
        _WS as _ws,
    )

    return rf"""
WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
t AS (SELECT doc_id, {_ws} AS ws FROM documents),
grams AS (
    SELECT doc_id,
           unnest(CASE WHEN len(ws) >= {_NOV_N}
                  THEN list_transform(range(1, len(ws) - {_NOV_N} + 2),
                                      i -> array_to_string(ws[i:i+{_NOV_N - 1}], ' '))
                  ELSE [] END) AS g
    FROM t
),
bucketed AS (
    SELECT doc_id * {_NOV_BUCKETS} // (mx + 1) AS bucket, g
    FROM grams CROSS JOIN mx
),
per AS (SELECT bucket, g, count(*) AS c FROM bucketed GROUP BY bucket, g),
first AS (SELECT g, min(bucket) AS fb FROM per GROUP BY g)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(sum(c) AS BIGINT) AS total_grams,
       CAST(sum(CASE WHEN fb = bucket THEN c ELSE 0 END) AS BIGINT) AS novel_grams,
       CAST((sum(CASE WHEN fb = bucket THEN c ELSE 0 END) * 1000000)
            // sum(c) AS DOUBLE) / 1000000.0 AS novel_share
FROM per JOIN first USING (g)
GROUP BY bucket
"""


# ---------------------------------------------------------------------------
# docs_token_bigram_entropy

_TBE_NANO = 1_000_000_000


def docs_token_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source conditional entropy H(w₂|w₁) of adjacent token
    pairs — the sequence-predictability screen: low conditional
    entropy means the next token is nearly determined (templates,
    boilerplate), high means genuinely varied prose. The
    sequence-aware complement of ``source_token_entropy`` (which
    scores the unigram bag).

    Exactness: H(w₂|w₁) = Σ_{(a,b)} −(c_ab/N)·ln(c_ab/c_a), each term
    nano-quantized from exact integer (c_ab, c_a, N) (the established
    per-term discipline), reduced by an exact integer sum.

    100 TB shape: one (source, bigram) partial-agg shuffle + a
    (source, w₁) rollup of THAT table (no second corpus pass) + a
    co-keyed join and source fold.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    bi = d.select(
        "source",
        F.explode_outer(
            T.word_ngrams(
                F.transform(T.words(F.col("text")), lambda w: F.lower(w)), 2
            )
        ).alias("bg"),
    ).filter(F.col("bg").isNotNull())
    # r10 optimization: `cab` feeds ca, tot AND the scoring join —
    # three per-branch re-runs of the corpus bigram explode.
    # Checkpoint the (source, bigram)-count table once per invocation.
    cab = (
        bi.groupBy("source", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(_plan_ckpt)
    )
    ca = cab.select(
        "source",
        F.substring_index(F.col("bg"), " ", 1).alias("w1"),
        "c",
    ).groupBy("source", "w1").agg(F.sum("c").alias("cw"))
    tot = cab.groupBy("source").agg(F.sum("c").alias("n_pairs"))
    joined = cab.select(
        "source", F.substring_index(F.col("bg"), " ", 1).alias("w1"), "c"
    ).join(ca, ["source", "w1"]).join(broadcast(tot), "source")
    p_ab = F.col("c").cast("double") / F.col("n_pairs")
    # ok-round: irrational (p*ln p entropy term)
    contrib = F.round(
        -(p_ab * F.log(F.col("c").cast("double") / F.col("cw"))) * _TBE_NANO
    ).cast("long")
    ent = joined.select("source", contrib.alias("e")).groupBy("source").agg(
        F.sum("e").alias("s")
    )
    return tot.join(ent, "source").select(
        "source",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        # ok-round: exact nano grid (6 dp)
        F.round(F.col("s").cast("double") / _TBE_NANO, 6).alias("cond_entropy"),
    )


DOCS_TOKEN_BIGRAM_ENTROPY_SQL = rf"""
WITH t AS (
    SELECT source,
           list_transform({_WS}, w -> lower(w)) AS ws
    FROM documents
),
bi AS (
    SELECT source,
           unnest(CASE WHEN len(ws) >= 2
                  THEN list_transform(range(1, len(ws)),
                                      i -> array_to_string(ws[i:i+1], ' '))
                  ELSE [] END) AS bg
    FROM t
),
cab AS (SELECT source, bg, count(*) AS c FROM bi GROUP BY source, bg),
ca AS (
    SELECT source, split_part(bg, ' ', 1) AS w1, sum(c) AS cw
    FROM cab GROUP BY source, split_part(bg, ' ', 1)
),
tot AS (SELECT source, sum(c) AS n_pairs FROM cab GROUP BY source),
ent AS (
    SELECT cab.source,
           -- ok-round: irrational (p*ln p entropy term)
           sum(CAST(round(-(CAST(cab.c AS DOUBLE) / tot.n_pairs
                            * ln(CAST(cab.c AS DOUBLE) / ca.cw))
                          * {_TBE_NANO}) AS BIGINT)) AS s
    FROM cab
    JOIN ca ON ca.source = cab.source AND ca.w1 = split_part(cab.bg, ' ', 1)
    JOIN tot ON tot.source = cab.source
    GROUP BY cab.source
)
SELECT t.source,
       CAST(t.n_pairs AS BIGINT) AS n_pairs,
       -- ok-round: exact nano grid (6 dp)
       round(CAST(e.s AS DOUBLE) / {_TBE_NANO}, 6) AS cond_entropy
FROM tot t JOIN ent e USING (source)
"""


# ---------------------------------------------------------------------------
# docs_numeric_density


def docs_numeric_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source histogram of numeric-token density (share of tokens
    containing a digit, in 10% bins) — the tables-and-price-lists
    screen: prose sits in bin 0-1, scraped spec sheets and logs pile
    high; a standard pre-training mix gate (Gopher's symbol-ratio
    family applied to digits).

    Exactness: the bin is exact integer floor division
    ``least(n_num·10 // n_tok, 9)`` on two integer counts (0-token
    docs pin to bin 0) — integer-only output.

    100 TB shape: one narrow map + a (source, bin) rollup; no joins.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    ws = T.words(F.col("text"))
    n_tok = F.size(ws).cast("long")
    n_num = F.size(
        F.filter(ws, lambda w: w.rlike("[0-9]"))
    ).cast("long")
    bin_ = F.when(
        n_tok > 0, F.least(F.floor(n_num * 10 / n_tok), F.lit(9))
    ).otherwise(F.lit(0))
    return (
        d.select("source", bin_.cast("long").alias("density_bin"))
        .groupBy("source", "density_bin")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


DOCS_NUMERIC_DENSITY_SQL = rf"""
WITH t AS (SELECT source, {_WS} AS ws FROM documents),
c AS (
    SELECT source, len(ws) AS n_tok,
           len(list_filter(ws, w -> regexp_matches(w, '[0-9]'))) AS n_num
    FROM t
)
SELECT source,
       CAST(CASE WHEN n_tok > 0 THEN least(n_num * 10 // n_tok, 9) ELSE 0 END
            AS BIGINT) AS density_bin,
       CAST(count(*) AS BIGINT) AS n_docs
FROM c GROUP BY 1, 2
"""


QUERIES = {
    "embedding_dim_kurtosis": embedding_dim_kurtosis,
    "embedding_centroid_shift": embedding_centroid_shift,
    "embedding_intrinsic_dim": embedding_intrinsic_dim,
    "docs_ngram_novelty_curve": docs_ngram_novelty_curve,
    "docs_token_bigram_entropy": docs_token_bigram_entropy,
    "docs_numeric_density": docs_numeric_density,
}

ORACLES = {
    "embedding_dim_kurtosis": EMBEDDING_DIM_KURTOSIS_SQL,
    "embedding_centroid_shift": EMBEDDING_CENTROID_SHIFT_SQL,
    "embedding_intrinsic_dim": _intrinsic_dim_sql(),
    "docs_ngram_novelty_curve": _novelty_sql(),
    "docs_token_bigram_entropy": DOCS_TOKEN_BIGRAM_ENTROPY_SQL,
    "docs_numeric_density": DOCS_NUMERIC_DENSITY_SQL,
}
